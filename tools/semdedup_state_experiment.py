"""Measure the streaming SemDeDup sink at a REAL batch-to-index ratio
(batch ≪ accumulated cell-partitioned index), and prove its targeted
cell-dir probe is bound by the BATCH's cells, not the index size.

The sibling of tools/neardup_state_experiment.py for the embedding
sink: `stream_semantic_dedup_sink` shares `stream_ann_ivf_sink`'s
cell-partitioned index, and its cross-batch probe reads ONLY the
batch's `cell=` partition dirs via basePath (targeted paths — listing
and scan both O(batch's cells)). The counterfactual it replaces —
reading the index root and filtering `cell.isin(touched)` — pays an
O(all cells) listing + full-footer discovery per micro-batch. Both
forms are timed here against the SAME seeded index, at the operator's
prescribed costing n_cells ~ n/10^4 (a B-vector batch touches <= B of
N/10^4 cells, so the targeted fraction shrinks linearly with the
index while the naive read grows with it).

1. SEED an N-vector cell-partitioned index directly (the same
   `ivf.index(...).write.partitionBy("cell")` the sink performs) with
   a frozen coarse quantizer fit once — seeding through the sink
   would just re-measure the bootstrap.
2. Deliver K tiny batches (each carrying 4 exact duplicates of
   indexed vectors, so pairs ARE emitted and verified) through the
   REAL sink, timing each micro-batch end-to-end.
3. Per batch, additionally time the two probe read forms standalone:
   targeted (basePath + touched cell dirs — what the sink does) vs
   naive root read + isin filter (what it refuses to do).
4. Assert every planted duplicate pair was emitted at cosine ~1.0
   (identical vectors always share a cell — the method's no-miss
   guarantee for exact dups).

    python tools/semdedup_state_experiment.py [--index N] [--batches K]
        [--batch-size B] [--dim D] [--keep]

Defaults: 1M-vector index at dim 64, 3 batches of 16 — n_cells = 100
at the prescribed costing, so each batch touches <= 16% of the cells
at 1M and the fraction halves for every doubling of the index.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.streaming.ingest import await_stream

DIM_DEFAULT = 64


def _with_embedding(df, dim: int):
    """Deterministic dim-float embedding from a `seed` column — a dup
    vector copies an indexed vector's seed (identical embedding,
    distinct vec_id), mirroring _with_text in the minhash experiment."""
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("seed") * F.lit(1_000_003) + j), F.lit(2000))
            .cast("double")
            / F.lit(1000.0)
            - F.lit(1.0)
        ).cast("float"),
    )
    return df.select("vec_id", emb.alias("embedding"))


def _index_frame(spark, n_index: int, dim: int):
    return _with_embedding(
        spark.range(n_index).select(
            F.col("id").alias("vec_id"), F.col("id").alias("seed")
        ),
        dim,
    )


def _batch_rows(spark, batch_no: int, batch_size: int, n_index: int, dim: int):
    """4 exact duplicates of indexed vectors (spread across the index)
    + fresh vectors colliding with nothing."""
    base_id = 10_000_000 + batch_no * batch_size
    rows = []
    for j in range(batch_size):
        vec_id = base_id + j
        if j < 4:
            seed = (batch_no * 49_999 + j * 12_347) % n_index
        else:
            seed = 20_000_000 + vec_id
        rows.append((vec_id, seed))
    return _with_embedding(
        spark.createDataFrame(rows, "vec_id long, seed long"), dim
    )


def main() -> None:
    from bharatmlstack_spark.operators.feature_store import (
        hadoop_list_partition_dirs,
    )
    from bharatmlstack_spark.operators.lsh import IvfIndex
    from bharatmlstack_spark.streaming.ingest import stream_semantic_dedup_sink

    args = sys.argv[1:]

    def opt(name: str, default: int) -> int:
        return int(args[args.index(name) + 1]) if name in args else default

    n_index = opt("--index", 1_000_000)
    n_batches = opt("--batches", 3)
    batch_size = opt("--batch-size", 16)
    dim = opt("--dim", DIM_DEFAULT)
    keep = "--keep" in args

    n_cells = max(16, math.ceil(n_index / 10_000))  # the prescribed costing
    work = tempfile.mkdtemp(prefix="bmls_sdexp_")
    topic = f"{work}/topic"
    index_path = f"{work}/index"
    out = f"{work}/out"
    ck = f"{work}/ck"

    spark = get_spark("semdedup-state-experiment")
    try:
        print(
            f"index={n_index} dim={dim} n_cells={n_cells} "
            f"batches={n_batches}x{batch_size}",
            file=sys.stderr,
        )
        base = _index_frame(spark, n_index, dim)
        t0 = time.perf_counter()
        ivf = IvfIndex(n_cells=n_cells)
        ivf.fit(base, sample_size=max(4096, 16 * n_cells))
        fit_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        ivf.index(base).write.mode("overwrite").partitionBy("cell").parquet(
            index_path
        )
        seed_s = round(time.perf_counter() - t0, 3)

        batch_times, probe_targeted, probe_naive = [], [], []
        expected_pairs: set[tuple[int, int]] = set()
        for k in range(n_batches):
            batch = _batch_rows(spark, k, batch_size, n_index, dim)
            base_id = 10_000_000 + k * batch_size
            for j in range(4):
                orig = (k * 49_999 + j * 12_347) % n_index
                a, b = sorted((orig, base_id + j))
                expected_pairs.add((a, b))
            batch.coalesce(1).write.mode("append").parquet(topic)

            # the sink, end-to-end (targeted probe inside)
            stream = spark.readStream.schema(
                "vec_id long, embedding array<float>"
            ).parquet(topic)
            t0 = time.perf_counter()
            q = stream_semantic_dedup_sink(
                stream, ivf, index_path, out, ck, spark,
                threshold=0.99, trigger_once=True,
            )
            await_stream(q, 1800)
            batch_times.append(round(time.perf_counter() - t0, 3))

            # standalone probe read forms against the NOW-accumulated
            # index, same touched-cell set as the batch the sink just
            # consumed (count() forces the scan)
            assigned = ivf.index(batch).persist()
            touched = [r[0] for r in assigned.select("cell").distinct().collect()]
            t0 = time.perf_counter()
            dirs = hadoop_list_partition_dirs(spark, index_path, "cell")
            paths = [dirs[c] for c in touched if c in dirs]
            spark.read.option("basePath", index_path).parquet(*paths).join(
                assigned.select("cell").distinct(), on="cell"
            ).count()
            probe_targeted.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            spark.read.parquet(index_path).filter(
                F.col("cell").isin(touched)
            ).join(assigned.select("cell").distinct(), on="cell").count()
            probe_naive.append(round(time.perf_counter() - t0, 3))
            assigned.unpersist()

        got = {
            (r.id_a, r.id_b)
            for r in spark.read.parquet(out)
            .dropDuplicates(["id_a", "id_b"])
            .collect()
        }
        missing = expected_pairs - got
        assert not missing, f"planted duplicate pairs not emitted: {missing}"

        print(
            json.dumps(
                {
                    "index_vectors": n_index,
                    "dim": dim,
                    "n_cells": n_cells,
                    "batch_vectors": batch_size,
                    "n_batches": n_batches,
                    "fit_s": fit_s,
                    "seed_s": seed_s,
                    "batch_s": batch_times,
                    "batch_mean_s": round(sum(batch_times) / len(batch_times), 3),
                    "probe_targeted_s": probe_targeted,
                    "probe_naive_s": probe_naive,
                    "probe_speedup_targeted_over_naive": round(
                        (sum(probe_naive) / len(probe_naive))
                        / (sum(probe_targeted) / len(probe_targeted)),
                        2,
                    ),
                    "planted_pairs_emitted": len(expected_pairs),
                }
            )
        )
    finally:
        spark.stop()
        if not keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
