"""Measure what compact_streamed_index buys: the per-READ cost of the
always-correct full-index dropDuplicates (read_streamed_ivf_index's
default) before vs after a one-time compaction, plus the steady-state
cost of the compactor's detection pass.

The append-only streamed states (IVF/SemDeDup index, near-dup
sets/bands) accrete byte-identical rows under at-least-once
redelivery; without compaction EVERY reader pays a shuffle of the
full accumulated index to collapse them. Compaction is the
once-not-per-read form of the same dedup — after it runs, readers may
skip the shuffle entirely (dedup=False).

1. SEED an N-vector cell-partitioned index holding R copies of every
   row (R simulated full redeliveries — the worst accretion a crash
   loop produces), via the same partitionBy("cell") write the sinks
   perform, at the prescribed costing n_cells ~ n/10^4.
2. Time the search-path read (read_streamed_ivf_index: dropDuplicates
   on id + count) against the duplicated state — the per-read cost
   every consumer pays today.
3. Run compact_streamed_index (detect + rewrite touched cell dirs),
   timing it; assert it removed exactly (R-1) * N rows.
4. Time the read again — dedup=True (shuffle over the now-minimal
   state) and dedup=False (scan only, the post-compaction hot path).
5. Run the compactor once more on the clean state — the steady-state
   detection-only cost (one column-pruned aggregation, zero writes).

    python tools/compaction_experiment.py [--index N] [--copies R]
        [--dim D] [--keep]

Defaults: 1M-vector index, 2 copies, dim 16.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", type=int, default=1_000_000)
    ap.add_argument("--copies", type=int, default=2)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bharatmlstack_spark.streaming.ingest import (
        compact_streamed_index,
        read_streamed_ivf_index,
    )

    spark = get_spark("compaction-experiment")
    work = tempfile.mkdtemp(prefix="bmls_compactexp_")
    index_path = f"{work}/index"
    n, r = args.index, args.copies
    n_cells = max(16, math.ceil(n / 10_000))

    # seed: deterministic embeddings + uniform cell assignment — the
    # distributional shape the quantizer produces, without paying a fit
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(args.dim)),
            lambda i: (F.pmod(F.col("id") * i, F.lit(997)) / 997.0).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id"), F.lit(n_cells)).cast("int").alias("cell"),
    )
    for _ in range(r):  # r identical appends = (r-1) full redeliveries
        base.write.mode("append").partitionBy("cell").parquet(index_path)

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 3)

    def timed2(fn):
        """[cold, warm] draws — footer/page-cache effects inflate the first
        read of a freshly-written state; the warm draw is the per-read
        steady-state cost the compaction argument is about."""
        out, cold = timed(fn)
        out2, warm = timed(fn)
        assert out == out2
        return out, [cold, warm]

    rows_before, read_dup_s = timed2(
        lambda: read_streamed_ivf_index(spark, index_path).count()
    )
    assert rows_before == n, rows_before

    removed, compact_s = timed(lambda: compact_streamed_index(spark, index_path))
    assert removed == (r - 1) * n, removed

    rows_after, read_clean_s = timed2(
        lambda: read_streamed_ivf_index(spark, index_path).count()
    )
    assert rows_after == n
    rows_raw, read_nodedup_s = timed2(
        lambda: read_streamed_ivf_index(spark, index_path, dedup=False).count()
    )
    assert rows_raw == n

    noop_removed, noop_s = timed(lambda: compact_streamed_index(spark, index_path))
    assert noop_removed == 0

    print(
        json.dumps(
            {
                "index_rows": n,
                "copies": r,
                "n_cells": n_cells,
                "read_dedup_duplicated_s": read_dup_s,
                "compact_s": compact_s,
                "read_dedup_compacted_s": read_clean_s,
                "read_nodedup_compacted_s": read_nodedup_s,
                "compact_noop_s": noop_s,
            }
        )
    )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
