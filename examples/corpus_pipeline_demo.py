"""End-to-end demo: raw document dump -> training-ready sequences.

The LLM-data-pipeline workflow this engine adds beyond the reference's
serving surface, every step a declarative Spark plan over the same
synthetic corpus the correctness gate uses:

  1. profile the drop (data-quality pass)
  2. filter by quality + language-ID
  3. re-weight the language mix (deterministic hash sampling)
  4. dedup: exact -> near-dup pairs -> connected-component clusters
  5. decontaminate against the held-out test split (5-gram overlap)
  6. chunk long docs, pack into fixed-budget sequences
  7. train/test split, reproducible

    python examples/corpus_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.functions import text as TX
from bharatmlstack_spark.operators import dedup as DD
from bharatmlstack_spark.operators.chunking import chunk_documents, pack_sequences
from bharatmlstack_spark.operators.graph import connected_components
from bharatmlstack_spark.operators.profile import profile_table
from bharatmlstack_spark.operators import sampling as SP
from bharatmlstack_spark.operators.sampling import mix_sample


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. profile the raw drop before trusting it
    print("== 1. profile ==")
    profile_table(docs, ["doc_id", "lang", "n_chars"]).show(truncate=False)

    # 2. quality + language gates (all JVM expressions)
    gated = TX.lang_id_frame(
        docs.withColumn("quality", TX.quality_score("text"))
    )
    kept = gated.filter((F.col("quality") >= 2 / 3) & (F.col("lang_guess") != "und"))
    print(f"== 2. quality/lang gate: {docs.count()} -> {kept.count()} docs ==")

    # 2b. PII scrub — redact emails/phones/IPs in place (pure scan)
    kept = kept.withColumn("text", TX.redact_pii("text"))
    n_pii = kept.filter(
        F.col("text").contains("[EMAIL]")
        | F.col("text").contains("[PHONE]")
        | F.col("text").contains("[IP]")
    ).count()
    # (the synthetic corpus carries no real PII — the scan still runs;
    # the pii_redact driver row injects deterministic PII to prove the
    # patterns fire)
    print(f"== 2b. PII scrub: {n_pii} docs carried redactions ==")

    # 3. re-weight the language mix
    mixed = mix_sample(
        kept, "lang", "doc_id", {"en": 1.0, "es": 0.5, "de": 0.5, "fr": 0.25, "zh": 0.25}
    )
    mixed.groupBy("lang").count().orderBy("lang").show()

    # 4. dedup: exact, then near-dup clusters (keep cluster minimum)
    exact = DD.exact_dedup(mixed, on=["text"], id_col="doc_id")
    pairs = DD.ngram_jaccard_pairs_prefix(
        exact, id_col="doc_id", text_col="text", n=3, threshold=0.8
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = exact.join(dropped, on="doc_id", how="left_anti")
    print(f"== 4. dedup: {mixed.count()} -> exact {exact.count()} -> clustered {deduped.count()} ==")

    # 4b. the same clusters MAINTAINED incrementally: stream the pair
    # set in waves through the persisted union-find — at corpus scale
    # this replaces the per-refresh connected_components recompute
    # (O(batch + touched clusters) per wave; see stream_dedup_clusters)
    import tempfile

    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        read_cluster_state,
        stream_cluster_sink,
    )

    work = tempfile.mkdtemp(prefix="demo_clusters_")
    waves = pairs.select("id_a", "id_b").withColumn(
        "__w", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(3))
    )
    for w in range(3):
        waves.filter(F.col("__w") == w).drop("__w").coalesce(1).write.mode(
            "append"
        ).parquet(f"{work}/topic")
    q = stream_cluster_sink(
        spark.readStream.schema("id_a bigint, id_b bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/topic"),
        state_dir=f"{work}/state",
        checkpoint_dir=f"{work}/ck",
        spark=spark,
        trigger_once=True,
    )
    await_stream(q, 300)
    inc = read_cluster_state(spark, f"{work}/state")
    n_diff = (
        inc.join(comps, on="node")
        .filter(inc.component != comps.component)
        .count()
    )
    print(f"== 4b. incremental clusters: {inc.count()} labels, {n_diff} differ from batch ==")
    import shutil

    shutil.rmtree(work, ignore_errors=True)

    # 5. decontaminate: drop train docs sharing a 5-gram with the test split
    split = F.when(SP.knuth_mix(F.col("doc_id")) % 100 < 80, "train").otherwise("test")
    tagged = deduped.withColumn("split", split)
    sh = tagged.select(
        "doc_id", "split", F.explode(DD.word_shingles("text", n=5)).alias("shingle")
    )
    test_sh = sh.filter(F.col("split") == "test").select("shingle").distinct()
    contaminated = (
        sh.filter(F.col("split") == "train")
        .join(test_sh, on="shingle")
        .select("doc_id")
        .distinct()
    )
    clean = tagged.join(contaminated, on="doc_id", how="left_anti")
    print(f"== 5. decontaminate: dropped {tagged.count() - clean.count()} train docs ==")

    # 5b. the FUZZY form at corpus scale: cross-dedup the train side
    # against the test split as a reference corpus — A-bands join
    # B-bands, so within-corpus pairs never materialize and the
    # candidate set scales with the incoming side's collisions
    fuzzy_hits = DD.minhash_lsh_cross_pairs(
        clean.filter(F.col("split") == "test"),
        clean.filter(F.col("split") == "train"),
        id_col="doc_id", text_col="text", threshold=0.8,
    ).select(F.col("id_b").alias("doc_id")).distinct()
    n_fuzzy = fuzzy_hits.count()
    clean = clean.join(fuzzy_hits, on="doc_id", how="left_anti")
    print(f"== 5b. fuzzy cross-dedup vs test: dropped {n_fuzzy} more ==")

    # 6. chunk + pack the train side into 512-token sequences
    train = clean.filter(F.col("split") == "train")
    chunks = chunk_documents(train, window=50, stride=40)
    with_ids = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("n_words").alias("n_tokens"),
    )
    packed = pack_sequences(with_ids, budget=512, n_shards=8)
    n_bins = packed.select("shard", "bin").distinct().count()
    print(f"== 6. {chunks.count()} chunks packed into {n_bins} sequences ==")

    # 7. the split is already deterministic — same doc, same side, every run
    clean.groupBy("split").count().show()

    # 8. write the train side as content-addressed shards + audit manifest
    import tempfile

    staged = train.select(
        "doc_id",
        F.concat(F.lit("s"), F.substring(F.md5("text"), 1, 1)).alias("shard_id"),
        "text",
    )
    out = tempfile.mkdtemp(prefix="corpus_demo_") + "/shards"
    staged.write.partitionBy("shard_id").mode("overwrite").parquet(
        out, compression="zstd"
    )
    manifest = (
        spark.read.parquet(out)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("shard_id")
    )
    print(f"== 8. wrote {manifest.count()} content-addressed shards to {out} ==")
    import shutil as _sh

    _sh.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)
    print("done.")


if __name__ == "__main__":
    main()
