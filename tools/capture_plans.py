"""Capture `.explain("formatted")` plan dumps for named queries AT A GIT REF.

    python tools/capture_plans.py <ref> <suffix> <query> [<query> ...]
        [--sf-dir /root/testdata/sf0.1] [--out-dir plans/rNN]

Writes <out-dir>/<query>_<suffix>.txt for each query (suffix is typically
"before" or "after"). When <ref> is not HEAD/WORKTREE, the capture runs in a
TEMPORARY `git worktree` checked out at that ref, in a SUBPROCESS, so the
plan really is the plan of that commit — the r16 verdict found two "before"
dumps identical to their "after" dumps because captures were taken from the
already-modified tree. This tool makes the `git stash` discipline mechanical:
before-plans come from the pre-change commit, by construction.

Product entries (bench_product.PRODUCT_QUERIES) and retired bench rows are
resolved the same way bench.py resolves them, so any bench surface can be
captured by name.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _capture_here(queries: list[str], sf_dir: str, out_dir: str, suffix: str) -> None:
    sys.path.insert(0, REPO)
    from bharatmlstack_spark import get_spark
    from bharatmlstack_spark.plans import explain_formatted
    from bharatmlstack_spark.queries import all_queries

    spark = get_spark("capture-plans")
    qs = all_queries()
    import bharatmlstack_spark.queries as _Q
    from bharatmlstack_spark.bench_product import PRODUCT_QUERIES

    os.makedirs(out_dir, exist_ok=True)
    for name in queries:
        fn = qs.get(name) or PRODUCT_QUERIES.get(name) or getattr(_Q, name)
        df = fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_formatted(df))
        print(f"wrote {path}", file=sys.stderr)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = None
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--out-dir" in args:
        i = args.index("--out-dir")
        out_dir = args[i + 1]
        del args[i : i + 2]
    if len(args) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    ref, suffix, queries = args[0], args[1], args[2:]
    out_dir = os.path.abspath(out_dir or os.path.join(REPO, "plans", "capture"))

    if ref in ("HEAD", "WORKTREE", "."):
        _capture_here(queries, sf_dir, out_dir, suffix)
        return

    # resolve the ref first so a typo fails before the worktree is made
    subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--verify", ref], check=True,
        stdout=subprocess.DEVNULL,
    )
    with tempfile.TemporaryDirectory(prefix="capture_plans_") as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref],
            check=True,
        )
        try:
            # the capture subprocess imports the package FROM THE WORKTREE
            # (cwd first on sys.path via this module re-invoked there); a
            # ref that predates this tool gets a copy dropped in
            wt_tool = os.path.join(wt, "tools", "capture_plans.py")
            if not os.path.exists(wt_tool):
                import shutil

                shutil.copy(os.path.abspath(__file__), wt_tool)
            subprocess.run(
                [
                    sys.executable,
                    wt_tool,
                    "WORKTREE",
                    suffix,
                    *queries,
                    "--sf-dir",
                    sf_dir,
                    "--out-dir",
                    out_dir,
                ],
                check=True,
                cwd=wt,
            )
        finally:
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", wt],
                check=False,
            )


if __name__ == "__main__":
    main()
