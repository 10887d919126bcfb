"""Measure what stream_cluster_sink buys over the recompute baseline:
per-batch cost of maintaining dedup-cluster labels incrementally
(persisted union-find, O(batch + touched clusters)) vs re-running
connected_components over the ACCUMULATED pair set after every batch
(O(corpus x diameter) — the only alternative the batch operators
offer).

1. SEED a label state of N nodes (N/2 two-node clusters) directly with
   the layout the sink writes — seeding through the sink would just
   re-measure the bootstrap batch.
2. Deliver K batches of B pairs through the REAL stream_cluster_sink
   (file-source topic, one availableNow pass per batch so each batch
   times separately). Each batch's pairs are drawn to exercise every
   path: fresh two-node clusters (label appends), attachments to seeded
   clusters (probe + star edges), and seeded-cluster MERGES (merge-log
   appends + forest resolution).
3. After each batch, time the recompute baseline: one
   connected_components pass over ALL pairs delivered so far (seed
   pairs included) — the cost a non-incremental pipeline pays at the
   same point.
4. Assert the two label readouts are IDENTICAL after the final batch
   (the correctness pin, same comparison as tests/test_stream_clusters.
   py), then report per-batch seconds for both arms and the read-path
   cost of read_cluster_state.

The claim under guard (SCALE.md r15): the incremental arm's per-batch
cost stays ~flat as the accumulated corpus grows, while the recompute
arm grows with it — at a 100 TB corpus the recompute arm simply cannot
run per batch.

    python tools/cluster_state_experiment.py [--nodes N] [--batches K]
        [--batch-pairs B] [--buckets NB] [--flat] [--keep]

Defaults: 1M seeded nodes, 6 batches of 2,000 pairs, 512 buckets —
a 250:1 state-to-batch ratio per wave; ``--flat`` runs the flat labels
layout (the bulk-regime winner, see SCALE.md r15).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.operators.graph import connected_components
from bharatmlstack_spark.streaming.ingest import (
    await_stream,
    read_cluster_state,
    stream_cluster_sink,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-pairs", type=int, default=2_000)
    ap.add_argument("--buckets", type=int, default=512)
    ap.add_argument("--flat", action="store_true", help="flat labels root (state_buckets=None)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="cluster_exp_")
    state = f"{work}/state"
    print(
        f"nodes={args.nodes} batches={args.batches} "
        f"batch_pairs={args.batch_pairs} "
        f"layout={'flat' if args.flat else f'bucketed:{args.buckets}'}",
        flush=True,
    )

    # --- 1. seed: nodes 0..N-1 as N/2 two-node clusters (2k, 2k+1),
    # written with the sink's own layout (labels bucketed, no merges)
    seed = spark.range(args.nodes).select(
        F.col("id").alias("node"),
        (F.col("id") - F.pmod(F.col("id"), F.lit(2))).alias("label"),
    )
    if args.flat:
        seed.write.parquet(f"{state}/labels")
    else:
        seed = seed.withColumn(
            "__kb", F.pmod(F.xxhash64(F.col("node")), F.lit(args.buckets))
        )
        seed.repartition("__kb").write.partitionBy("__kb").parquet(f"{state}/labels")
        import json as _json

        from bharatmlstack_spark.operators.feature_store import (
            TABLE_META_FILE,
            hadoop_write_text_atomic,
        )

        hadoop_write_text_atomic(
            spark,
            os.path.join(state, TABLE_META_FILE),
            _json.dumps({"n_buckets": args.buckets}),
        )
    seed_pairs = spark.range(args.nodes // 2).select(
        (F.col("id") * 2).alias("id_a"), (F.col("id") * 2 + 1).alias("id_b")
    )
    seed_pairs.write.parquet(f"{work}/all_pairs")  # the recompute arm's base

    # --- 2+3. K batches: 1/3 fresh clusters (new ids above N), 1/3
    # attachments (new id -> seeded node), 1/3 seeded-cluster merges
    # (seeded even -> seeded even of another cluster)
    rows_inc, rows_re = [], []
    third = args.batch_pairs // 3
    for k in range(args.batches):
        base = args.nodes + k * args.batch_pairs * 2
        fresh = spark.range(third).select(
            (base + F.col("id") * 2).alias("id_a"),
            (base + F.col("id") * 2 + 1).alias("id_b"),
        )
        attach = spark.range(third).select(
            (base + args.batch_pairs + F.col("id")).alias("id_a"),
            (F.pmod(F.col("id") * 9973 + k, F.lit(args.nodes))).alias("id_b"),
        )
        merge = spark.range(args.batch_pairs - 2 * third).select(
            (F.pmod(F.col("id") * 2 * 7919 + k * 31, F.lit(args.nodes // 2)) * 2).alias(
                "id_a"
            ),
            (F.pmod(F.col("id") * 2 * 104729 + k * 57, F.lit(args.nodes // 2)) * 2).alias(
                "id_b"
            ),
        )
        batch = fresh.unionByName(attach).unionByName(merge)
        topic = f"{work}/topic_{k}"
        batch.coalesce(1).write.parquet(topic)
        batch.write.mode("append").parquet(f"{work}/all_pairs")

        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema("id_a bigint, id_b bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(topic)
        )
        q = stream_cluster_sink(
            stream,
            state_dir=state,
            checkpoint_dir=f"{work}/ck_{k}",
            spark=spark,
            state_buckets=None if args.flat else args.buckets,
            trigger_once=True,
        )
        await_stream(q, 600)
        inc_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        all_pairs = spark.read.parquet(f"{work}/all_pairs")
        n_labels = connected_components(all_pairs, src="id_a", dst="id_b").count()
        re_s = time.perf_counter() - t0
        rows_inc.append(round(inc_s, 2))
        rows_re.append(round(re_s, 2))
        print(
            f"batch {k}: incremental {inc_s:.2f}s  recompute {re_s:.2f}s "
            f"(corpus pairs so far: {(args.nodes // 2) + (k + 1) * args.batch_pairs:,}, "
            f"labels {n_labels:,})",
            flush=True,
        )

    # --- 4. correctness pin + read-path cost
    t0 = time.perf_counter()
    inc_labels = read_cluster_state(spark, state)
    n_inc = inc_labels.count()
    read_s = time.perf_counter() - t0
    ref = connected_components(
        spark.read.parquet(f"{work}/all_pairs"), src="id_a", dst="id_b"
    )
    diff = (
        inc_labels.withColumnRenamed("component", "c_inc")
        .join(ref.withColumnRenamed("component", "c_ref"), on="node", how="full_outer")
        .filter(
            F.col("c_inc").isNull()
            | F.col("c_ref").isNull()
            | (F.col("c_inc") != F.col("c_ref"))
        )
        .count()
    )
    assert diff == 0, f"{diff} label mismatches vs the one-shot recompute"
    n_merges = (
        spark.read.parquet(f"{state}/merges").count()
        if os.path.isdir(f"{state}/merges")
        else 0
    )
    print(
        json.dumps(
            {
                "incremental_per_batch_s": rows_inc,
                "recompute_per_batch_s": rows_re,
                "read_cluster_state_s": round(read_s, 2),
                "final_nodes": n_inc,
                "merge_log_rows": n_merges,
                "labels_identical": True,
            }
        ),
        flush=True,
    )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
