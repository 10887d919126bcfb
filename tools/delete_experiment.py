"""Measure the tombstone-deletion story on a postings index at the
scale where the design choices bind (hundreds of term buckets' worth of
Zipfian postings, local[32]):

1. delete cost — a 1% tombstone wave is an O(wave) side-table append,
   regardless of index size;
2. read-side mask cost — the broadcast anti-join a search pays while
   tombstones are pending, with 1 wave and with 10 accumulated waves;
3. fold cost and WHY it must amortize — a doc's terms hash across every
   term bucket, so folding a uniformly-sampled wave rewrites ~all
   postings dirs (doclen dirs stay derived/targeted). The experiment
   folds 10 accumulated waves in ONE pass and then a fresh 1-wave fold
   on the same index: near-equal walls are the measured argument for
   folding at maintenance cadence instead of per-delete (10 waves,
   one rewrite) — and for why an EAGER delete (a root rewrite per
   wave) would cost ~10x this steady-state.

Result equality is asserted: the masked search over pending tombstones
must return exactly what the folded index returns.

    python tools/delete_experiment.py [--docs N] [--words W]
        [--buckets B] [--keep]

Defaults: 200k docs x 60 words, 64 buckets (~7M postings rows).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.streaming.ingest import (
    POSTINGS_DIR,
    bm25_search_streamed,
    delete_postings_docs,
    fold_postings_tombstones,
)
from tools.postings_state_experiment import seed_index, timed_search


def _wave_ids(n_docs: int, k: int) -> list[int]:
    """The k-th 1% wave: doc ids congruent to k mod 100."""
    return list(range(k, n_docs, 100))


def main() -> None:
    args = dict(zip(sys.argv[1::2], sys.argv[2::2]))

    def opt(name, default):
        return int(args.get(name, default))

    n_docs, words, buckets = (
        opt("--docs", 200_000), opt("--words", 60), opt("--buckets", 64)
    )
    keep = "--keep" in sys.argv
    spark = get_spark("delete-experiment")
    work = tempfile.mkdtemp(prefix="bmls_delexp_")
    index = f"{work}/index"
    out: dict = {"n_docs": n_docs, "words": words, "buckets": buckets}

    t0 = time.time()
    out["postings_rows"] = seed_index(spark, index, n_docs, words, buckets)
    out["seed_s"] = round(time.time() - t0, 2)

    out["search_baseline_s"], baseline_rows = timed_search(spark, index)

    # 1 wave pending: write cost + masked-search cost
    t0 = time.time()
    n = delete_postings_docs(spark, index, _wave_ids(n_docs, 0))
    out["tombstone_write_1pct_s"] = round(time.time() - t0, 2)
    out["wave_size"] = n
    out["search_masked_1wave_s"], masked_rows = timed_search(spark, index)
    if masked_rows == baseline_rows:
        raise RuntimeError("the 1% wave did not bind — mask attests nothing")

    # 9 more waves accumulate (the maintenance-cadence regime)
    t0 = time.time()
    for k in range(1, 10):
        delete_postings_docs(spark, index, _wave_ids(n_docs, k))
    out["tombstone_write_9more_s"] = round(time.time() - t0, 2)
    out["search_masked_10waves_s"], masked10_rows = timed_search(spark, index)

    # ONE fold reclaims all 10 waves
    t0 = time.time()
    stats = fold_postings_tombstones(spark, index)
    out["fold_10waves_s"] = round(time.time() - t0, 2)
    out["fold_10waves_rows_purged"] = stats["postings_removed"]
    post_dirs = [
        d for d in os.listdir(f"{index}/{POSTINGS_DIR}")
        if d.startswith("term_bucket=")
    ]
    out["postings_dirs_after_fold"] = len(post_dirs)
    out["search_folded_s"], folded_rows = timed_search(spark, index)

    # the masked searches must already have served the post-delete truth
    # (a real raise, not an assert — python -O would strip an assert and
    # print timings over wrong results)
    if masked10_rows != folded_rows:
        raise RuntimeError("mask != fold result — the timings are invalid")

    # a fresh single-wave fold on the SAME index: ~the same wall as the
    # 10-wave fold (the rewrite is bucket-population-bound, not
    # wave-bound) — the measured amortization argument
    delete_postings_docs(spark, index, _wave_ids(n_docs, 10))
    t0 = time.time()
    stats1 = fold_postings_tombstones(spark, index)
    out["fold_1wave_s"] = round(time.time() - t0, 2)
    out["fold_1wave_rows_purged"] = stats1["postings_removed"]

    print(json.dumps(out, indent=2))
    if not keep:
        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"# kept: {work}", file=sys.stderr)


if __name__ == "__main__":
    main()
