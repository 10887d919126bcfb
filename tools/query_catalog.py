"""Generate QUERIES.md: the full registry, one line per query — name,
driver-window position, oracle form, and the docstring's first sentence.

    python tools/query_catalog.py [out_md]

Mechanical artifact (re-runnable every round); the authoritative mapping
from SURVEY §2 operator IDs to queries lives in README.md's parity map.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bharatmlstack_spark.queries import all_oracles, all_queries


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text[:160]


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else "QUERIES.md"
    queries, oracles = all_queries(), all_oracles()
    lines = [
        "# QUERIES — the registered (Spark, DuckDB-oracle) pairs\n",
        f"\n{len(queries)} queries; the round driver hash-verifies the "
        "first 50 (the `window` column) each round at sf0.01. Generated "
        "by `python tools/query_catalog.py`.\n",
        "\n| # | query | window | oracle | what it does |\n",
        "|---|---|---|---|---|\n",
    ]
    for i, (name, fn) in enumerate(queries.items(), start=1):
        window = "✓" if i <= 50 else ""
        oracle = "value-hash" if name in oracles else "rows-only"
        desc = first_sentence(fn.__doc__).replace("|", "\\|")
        lines.append(f"| {i} | {name} | {window} | {oracle} | {desc} |\n")
    with open(out_md, "w") as f:
        f.writelines(lines)
    print(f"wrote {out_md} ({len(queries)} queries)")


if __name__ == "__main__":
    main()
