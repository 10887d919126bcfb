"""Measure what refit_streamed_index buys: the per-batch PROBE cost
against a streamed IVF/SemDeDup index whose coarse quantizer was frozen
when the stream was small, before vs after a one-time refit.

compact_streamed_index reclaims duplicate rows but keeps the BOOTSTRAP
quantizer: as the accumulated stream grows G-fold past the fit point,
per-cell population grows G-fold with it, and every same-cell probe
(SemDeDup candidate generation, ANN nprobe scan) pays G times the
candidates it was costed for — sum(|cell|) over the batch's cells, the
quantity this experiment counts. The refit re-derives n_cells from the
ACCUMULATED count (cells ~ n/10^4, the prescription the batch SemDeDup
row uses), re-fits, re-assigns, and swaps — restoring ~target-sized
cells no matter how far the stream outgrew bootstrap.

1. SEED an N-vector index assigned with a quantizer FIT ON THE FIRST
   N0 rows at the prescribed costing for N0 (the bootstrap regime) —
   the state a frozen-quantizer sink produces after the stream grew
   N/N0-fold.
2. Probe with a fresh B-vector batch under the frozen quantizer: count
   same-cell candidate pairs and time the count (the per-batch SemDeDup
   probe the sink runs).
3. refit_streamed_index (re-derive n_cells from N, re-fit, re-assign,
   staged swap), timing it.
4. Probe the SAME batch under the refit quantizer: same count + time.

    python tools/refit_experiment.py [--index N] [--bootstrap N0]
        [--batch B] [--dim D] [--keep]

Defaults: 400k-vector index, bootstrap fit at 40k (10x growth), 2k
batch, dim 16.
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
    ap.add_argument("--index", type=int, default=400_000)
    ap.add_argument("--bootstrap", type=int, default=40_000)
    ap.add_argument("--batch", type=int, default=2_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bharatmlstack_spark.operators.lsh import IvfIndex
    from bharatmlstack_spark.streaming.ingest import refit_streamed_index

    spark = get_spark("refit-experiment")
    work = tempfile.mkdtemp(prefix="bmls_refitexp_")
    index_path = f"{work}/index"
    n, n0, b = args.index, args.bootstrap, args.batch

    def emb(id_col):
        # deterministic pseudo-random embeddings, JVM-side
        return F.transform(
            F.sequence(F.lit(1), F.lit(args.dim)),
            lambda i: (F.pmod(F.xxhash64(id_col * i), F.lit(997)) / 997.0).cast(
                "float"
            ),
        )

    base = spark.range(n).select(
        F.col("id").alias("vec_id"), emb(F.col("id")).alias("embedding")
    )
    # bootstrap regime: quantizer fit on the FIRST n0 rows at the
    # prescribed costing FOR n0 — then frozen while the stream grew n/n0x
    n_cells0 = max(16, math.ceil(n0 / 10_000))
    idx0 = IvfIndex(n_cells=n_cells0).fit(base.filter(F.col("vec_id") < n0))
    (
        idx0.index(base)
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(index_path)
    )

    batch = spark.range(n, n + b).select(
        F.col("id").alias("vec_id"), emb(F.col("id")).alias("embedding")
    )

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 3)

    def probe(ivf):
        # the sink's per-batch probe shape: same-cell candidates of the
        # batch against the accumulated index (SemDeDup's pair universe)
        assigned = ivf.index(batch).select("vec_id", "cell")
        index = spark.read.parquet(index_path).select(
            F.col("vec_id").alias("id_o"), "cell"
        )
        return assigned.join(index, on="cell").count()

    def cell_stats():
        per = (
            spark.read.parquet(index_path)
            .groupBy("cell")
            .count()
            .agg(
                F.count("*").alias("cells"),
                F.max("count").alias("max_pop"),
                F.avg("count").alias("avg_pop"),
            )
            .collect()[0]
        )
        return int(per["cells"]), int(per["max_pop"]), round(float(per["avg_pop"]))

    cells_before = cell_stats()
    cands_before, probe_before_s = timed(lambda: probe(idx0))

    stats, refit_s = timed(
        lambda: refit_streamed_index(spark, index_path, target_cell_rows=10_000)
    )
    assert stats["n"] == n

    cells_after = cell_stats()
    cands_after, probe_after_s = timed(lambda: probe(stats["ivf"]))

    print(
        json.dumps(
            {
                "index_rows": n,
                "bootstrap_rows": n0,
                "batch_rows": b,
                "n_cells_frozen": n_cells0,
                "n_cells_refit": stats["n_cells_after"],
                "cells_max_avg_before": cells_before,
                "cells_max_avg_after": cells_after,
                "probe_candidates_before": cands_before,
                "probe_candidates_after": cands_after,
                "probe_s_before": probe_before_s,
                "probe_s_after": probe_after_s,
                "refit_s": refit_s,
            }
        )
    )

    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
