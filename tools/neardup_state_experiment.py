"""Measure the bucketed streaming near-dup regime at a REAL
batch-to-index ratio (batch ≪ accumulated state).

SCALE.md's 10x table times ``stream_dedup_minhash`` as a replay harness:
6 micro-batches that together ARE the corpus, so every batch touches
every bucket and the flat layout wins (its 6.24x ratio is the worst
registered row). The production regime is the opposite — small batches
probing a large pre-accumulated index. This tool builds that regime:

1. SEED an N-doc state directly with the same derivations the sink
   writes (hashed shingle sets; minhash band index; ``__kb`` partition
   dirs for the bucketed layout) — seeding through the sink itself
   would just re-measure the bootstrap batch.
2. Deliver K tiny batches (each carrying 4 true near-dups of indexed
   docs so the verify path does real work) through the REAL
   ``stream_neardup_minhash_sink`` and time each micro-batch
   end-to-end, for the FLAT and the BUCKETED layout on identical data.
3. Deliver K more batches with ``phase_log`` instrumentation to
   attribute the per-batch cost: sign (signature map, layout-blind),
   probe (band-index read+join — the touched-bucket prune), verify
   (shingle-store read+jaccard — the candidate-bucket prune), append
   (state writes — where the bucketed layout PAYS, one file per
   touched dir, amortized by batch size in production).

Three layouts run: FLAT (both roots flat), HYBRID (the bucketed
default: fat shingle store partitioned, thin band index flat — the
verify prune with almost no append tax), and FULL (bucket_bands=True:
both roots partitioned — band pruning too, maximal append tax).

Pair readouts are asserted equal across layouts (the correctness pin,
same as tests/test_streaming.py).

    python tools/neardup_state_experiment.py [--index N] [--batches K]
        [--batch-size B] [--buckets NB] [--keep]

Defaults: 1M-doc index, 3+3 batches of 16 docs, 2048 buckets — a
62500:1 index-to-batch ratio, the "10^4-doc batches into a 10^9-doc
index" shape scaled to local[32].
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.streaming.ingest import await_stream

VOCAB = 20_000
# ~real-corpus document size: the shingle store (the verify side) is the
# FAT state root, ~words hashes per doc; 12-word docs undersell it ~8x
WORDS_PER_DOC = 100
NUM_HASHES = 64
BANDS = 16
SHINGLE_N = 3


def _with_text(df, words: int = WORDS_PER_DOC):
    """Deterministic `words`-word text from a `seed` column — a dup doc copies
    an index doc's seed (identical text, distinct doc_id)."""
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("seed") * F.lit(1_000_003) + j), F.lit(VOCAB)).cast(
            "string"
        ),
    )
    return df.select(
        "doc_id",
        F.concat_ws(" ", *[word(j) for j in range(words)]).alias("text"),
    )


def seed_state(
    spark, state: str, n_index: int, buckets: int | None, bucket_bands: bool
) -> float:
    """Write the accumulated state the sink would have built for the
    index corpus (same shingle/signature/band derivations, same bucket
    expressions), so the experiment starts at batch ≪ index without
    paying a streaming bootstrap."""
    from bharatmlstack_spark.operators.dedup import (
        band_signatures,
        hashed_word_shingles,
        minhash_signatures_from_hashes,
    )

    t0 = time.perf_counter()
    idx = spark.range(n_index).select(
        F.col("id").alias("doc_id"), F.col("id").alias("seed")
    )
    docs = _with_text(idx)
    sets = docs.select(
        F.col("doc_id").alias("id"),
        hashed_word_shingles("text", SHINGLE_N).alias("sh"),
    )
    if buckets:
        (
            sets.withColumn("__kb", F.pmod(F.xxhash64(F.col("id")), F.lit(buckets)))
            .repartition("__kb")
            .write.mode("overwrite")
            .partitionBy("__kb")
            .parquet(f"{state}/sets")
        )
    else:
        sets.write.mode("overwrite").parquet(f"{state}/sets")
    sets_back = spark.read.parquet(f"{state}/sets")  # seed once, sign from disk
    sigs = minhash_signatures_from_hashes(
        sets_back.select("id", "sh"), "id", "sh", NUM_HASHES
    )
    bands = band_signatures(sigs, BANDS)
    if buckets and bucket_bands:
        (
            bands.withColumn("__kb", F.pmod("band_hash", F.lit(buckets)))
            .repartition("__kb")
            .write.mode("overwrite")
            .partitionBy("__kb")
            .parquet(f"{state}/bands")
        )
    else:
        bands.write.mode("overwrite").parquet(f"{state}/bands")
    return round(time.perf_counter() - t0, 3)


def _batch_rows(spark, batch_no: int, batch_size: int, n_index: int):
    """Batch docs: 4 true dups of indexed docs (spread across the index)
    + fresh docs whose seeds collide with nothing."""
    base_id = 10_000_000 + batch_no * batch_size
    rows = []
    for j in range(batch_size):
        doc_id = base_id + j
        if j < 4:
            seed = (batch_no * 49_999 + j * 12_347) % n_index
        else:
            seed = 20_000_000 + doc_id
        rows.append((doc_id, seed))
    return _with_text(spark.createDataFrame(rows, "doc_id long, seed long"))


def run_layout(
    spark,
    work: str,
    tag: str,
    n_index: int,
    n_batches: int,
    batch_size: int,
    buckets: int | None,
    bucket_bands: bool = False,
):
    from bharatmlstack_spark.streaming.ingest import stream_neardup_minhash_sink

    topic = f"{work}/{tag}_topic"
    state = f"{work}/{tag}_state"
    out = f"{work}/{tag}_out"
    ck = f"{work}/{tag}_ck"

    seed_s = seed_state(spark, state, n_index, buckets, bucket_bands)

    def deliver(phase_log=None) -> float:
        stream = spark.readStream.schema("doc_id long, text string").parquet(topic)
        t0 = time.perf_counter()
        q = stream_neardup_minhash_sink(
            stream, state, out, ck, spark,
            id_col="doc_id", text_col="text",
            num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
            trigger_once=True, state_buckets=buckets,
            bucket_bands=bucket_bands, phase_log=phase_log,
        )
        await_stream(q, 1800)
        return round(time.perf_counter() - t0, 3)

    # K end-to-end batches, then K instrumented ones (phase boundaries
    # are forced with count() actions, so the two sets time separately)
    batch_times, phases = [], []
    for k in range(n_batches):
        _batch_rows(spark, k, batch_size, n_index).coalesce(1).write.mode(
            "append"
        ).parquet(topic)
        batch_times.append(deliver())
    for k in range(n_batches, 2 * n_batches):
        _batch_rows(spark, k, batch_size, n_index).coalesce(1).write.mode(
            "append"
        ).parquet(topic)
        deliver(phase_log=phases)

    pairs = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(out).dropDuplicates(["id_a", "id_b"]).collect()
    }
    mean_phase = {
        key: round(sum(p[key] for p in phases) / len(phases), 3)
        for key in phases[0]
    }
    return {
        "seed_s": seed_s,
        "batch_s": batch_times,
        "batch_mean_s": round(sum(batch_times) / len(batch_times), 3),
        "phase_mean": mean_phase,
        "pairs": len(pairs),
    }, pairs


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: int) -> int:
        return int(args[args.index(name) + 1]) if name in args else default

    n_index = opt("--index", 1_000_000)
    n_batches = opt("--batches", 3)
    batch_size = opt("--batch-size", 16)
    buckets = opt("--buckets", 2048)
    keep = "--keep" in args

    work = tempfile.mkdtemp(prefix="bmls_ndexp_")
    spark = get_spark("neardup-state-experiment")
    try:
        print(
            f"index={n_index} batches={n_batches}x{batch_size} buckets={buckets}",
            file=sys.stderr,
        )
        flat, flat_pairs = run_layout(
            spark, work, "flat", n_index, n_batches, batch_size, None
        )
        print(f"flat: {flat}", file=sys.stderr)
        hyb, hyb_pairs = run_layout(
            spark, work, "hyb", n_index, n_batches, batch_size, buckets
        )
        print(f"hybrid: {hyb}", file=sys.stderr)
        buck, buck_pairs = run_layout(
            spark, work, "buck", n_index, n_batches, batch_size, buckets,
            bucket_bands=True,
        )
        print(f"full-bucketed: {buck}", file=sys.stderr)
        assert flat_pairs == hyb_pairs == buck_pairs, "layouts disagree on the pair set"
        def read_side(r):
            return r["phase_mean"]["probe_s"] + r["phase_mean"]["verify_s"]

        print(
            json.dumps(
                {
                    "index_docs": n_index,
                    "batch_docs": batch_size,
                    "n_batches": n_batches,
                    "state_buckets": buckets,
                    "flat": flat,
                    "hybrid": hyb,
                    "full_bucketed": buck,
                    "e2e_speedup_hybrid_over_flat": round(
                        flat["batch_mean_s"] / hyb["batch_mean_s"], 2
                    ),
                    "e2e_speedup_full_over_flat": round(
                        flat["batch_mean_s"] / buck["batch_mean_s"], 2
                    ),
                    "probe_verify_speedup_hybrid_over_flat": round(
                        read_side(flat) / read_side(hyb), 2
                    ),
                    "probe_verify_speedup_full_over_flat": round(
                        read_side(flat) / read_side(buck), 2
                    ),
                }
            )
        )
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
