"""Bench-only PRODUCT paths for the exact-recall driver rows.

The registered forms of ann_lsh_dot / ann_ivf_dot / pq_ann_topk /
dedup_simhash deliver the EXACT side (so DuckDB can hash-verify them) and
carry the approximate path only as a recall flag — correct for the gate,
but their bench times measure verification harness + product together.
These variants time what actually ships at 100 TB: index + probe +
re-score alone, no exact brute-force side. Same operators, same
parameters as the registered rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _emb_split(spark: SparkSession, sf_dir: str):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    cands = emb.filter(F.col("vec_id") >= 5)
    return queries_df, cands


def ann_lsh_dot_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band index + bucket probe + exact re-score top-10 (the product
    half of ann_lsh_dot)."""
    from bharatmlstack_spark.operators.lsh import LshIndex

    queries_df, cands = _emb_split(spark, sf_dir)
    idx = LshIndex(dim=64, n_planes=16, n_bands=8)
    return idx.search(idx.index(cands), queries_df, k=10, metric="DOT")


def ann_ivf_dot_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF fit + nprobe-cell probe + exact re-score top-10 (the product
    half of ann_ivf_dot)."""
    from bharatmlstack_spark.operators.lsh import IvfIndex

    queries_df, cands = _emb_split(spark, sf_dir)
    idx = IvfIndex(n_cells=16).fit(cands, sample_size=512, iters=3)
    return idx.search(idx.index(cands), queries_df, k=10, nprobe=8, metric="DOT")


def pq_ann_topk_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ fit + encode + ADC shortlist-50 + exact re-rank top-10 (the
    product half of pq_ann_topk)."""
    import numpy as np

    from bharatmlstack_spark.operators.pq import PqIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    cands = emb.filter(F.col("vec_id") >= 5)
    idx = PqIndex(m=16, k=64).fit(cands, sample_size=1024)
    return idx.search(
        idx.encode(cands), np.array(qrow[0]), k=10, rerank=cands, shortlist=50
    )


def dedup_simhash_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint + pigeonhole-banded hamming<=3 pairs (the
    product half of dedup_simhash — no exact PPJoin verification side)."""
    from bharatmlstack_spark.operators import dedup as DD
    from bharatmlstack_spark.queries_text import corpus

    docs = corpus(spark, sf_dir)
    fp = DD.simhash(docs, id_col="doc_id", text_col="text")
    return DD.simhash_near_pairs(fp, max_hamming=3).select("id_a", "id_b")


def dedup_minhash_lsh_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shingle -> minhash -> band bucket-join -> CANDIDATE-LOCAL Jaccard
    verify. Unlike simhash/ANN rows, the registered dedup_minhash_lsh row
    is already product-shaped on the Spark side (its exact-recall proof
    lives in the DuckDB oracle, not in the Spark plan), so this entry
    times the identical pipeline — it exists so the product_queries
    section benches every approximate-dedup/ANN path standalone."""
    from bharatmlstack_spark.operators import dedup as DD
    from bharatmlstack_spark.queries_text import corpus

    return DD.minhash_lsh_dedup_pairs(
        corpus(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        num_hashes=64,
        bands=16,
        threshold=0.8,
    ).select("id_a", "id_b")


# one prebuilt streamed-postings index per (process, sf_dir): the bench
# times the READ path (what serves queries at 100 TB), not the one-time
# build — the first draw pays the build, the recorded median of >=3
# draws reflects the search alone
_STREAMED_BM25_INDEX: dict[str, str] = {}


def _prebuilt_streamed_postings(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the streamed postings index over the
    documents corpus, then leave ONE deletion wave PENDING (tombstones
    appended, not folded) so the timed search exercises the shipping
    steady-state read path: bucket-pruned postings read + broadcast
    tombstone mask + in-plan dedup."""
    path = _STREAMED_BM25_INDEX.get(sf_dir)
    if path:
        return path
    from bharatmlstack_spark.query_registry import scratch_dir
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        delete_postings_docs,
        stream_postings_sink,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    work = scratch_dir("bmls_bench_bm25s_")
    topic, index_path = f"{work}/topic", f"{work}/index"
    docs.repartition(3).write.parquet(topic)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_postings_sink(
        stream, index_path, f"{work}/ck", spark,
        n_buckets=16, trigger_once=True,
    )
    await_stream(q, 1800, "stream_postings_sink (bench prebuild)")
    victims = docs.filter(F.col("doc_id") % 101 == 7).select("doc_id")
    delete_postings_docs(spark, index_path, victims)
    _STREAMED_BM25_INDEX[sf_dir] = index_path
    return index_path


def ann_ivfpq_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ fit + residual-code index + nprobe ADC + exact re-rank
    top-10 (the product half of the staged ann_ivfpq_topk row — recorded
    ahead of its graduation so the r15 registration lands with a bench
    baseline)."""
    import numpy as np

    from bharatmlstack_spark.operators.ivfpq import IvfPqIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    cands = emb.filter(F.col("vec_id") >= 5)
    idx = IvfPqIndex(n_cells=16, m=16, k=64).fit(cands, sample_size=1024)
    return idx.search(
        idx.index(cands), np.array(qrow[0]), k=10,
        nprobe=8, rerank=cands, shortlist=100,
    )


def bm25_search_streamed_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 through the PREBUILT streamed postings index with one
    pending deletion wave — the flagship streamed-index family's read
    path (term-bucket pruning + broadcast tombstone mask + in-plan
    dedup), regression-guarded standalone: the registered
    stream_bm25_search row times build + compact + search together."""
    from bharatmlstack_spark.queries_text import _BM25_TERMS
    from bharatmlstack_spark.streaming.ingest import bm25_search_streamed

    index_path = _prebuilt_streamed_postings(spark, sf_dir)
    return bm25_search_streamed(spark, index_path, _BM25_TERMS, k=10)


# one prebuilt VERSIONED index with several pending update waves — the
# steady state of an update-heavy stream; cached like the masked index
_STREAMED_MULTIWAVE_INDEX: dict[str, str] = {}


def _prebuilt_multiwave_postings(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the VERSIONED streamed postings index:
    the full corpus as batch 0, then THREE update waves (each
    re-publishing ~9% of the docs) left PENDING — update-tombstones
    appended by the sink's re-arrival probe, nothing folded. The timed
    search then pays the shipping steady state of an update-heavy
    stream: bucket-pruned postings read + ONE broadcast gen-mask
    anti-join covering all three waves + in-plan dedup."""
    path = _STREAMED_MULTIWAVE_INDEX.get(sf_dir)
    if path:
        return path
    import os

    from bharatmlstack_spark.query_registry import scratch_dir
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_postings_sink,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    work = scratch_dir("bmls_bench_bm25mw_")
    topic, index_path = f"{work}/topic", f"{work}/index"
    # one file per wave, mtimes pinned ascending: the file source breaks
    # mtime ties arbitrarily, and wave order IS the update semantics
    base, seen = 1_600_000_000, set()

    def _pin(i: int) -> None:
        for f in sorted(os.listdir(topic)):
            if f.endswith(".parquet") and f not in seen:
                os.utime(os.path.join(topic, f), (base + i * 60,) * 2)
                seen.add(f)

    docs.coalesce(1).write.parquet(topic)
    _pin(0)
    for i in (1, 2, 3):
        docs.filter(F.col("doc_id") % 11 == i).coalesce(1).write.mode(
            "append"
        ).parquet(topic)
        _pin(i)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_postings_sink(
        stream, index_path, f"{work}/ck", spark,
        n_buckets=16, trigger_once=True, allow_updates=True,
    )
    await_stream(q, 1800, "stream_postings_sink (multiwave prebuild)")
    _STREAMED_MULTIWAVE_INDEX[sf_dir] = index_path
    return index_path


def bm25_search_multiwave_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked BM25 top-10 through the versioned streamed index with
    THREE pending update waves — regression-guards the mask's flat-cost
    claim (SCALE.md): the gen-mask is ONE broadcast anti-join no matter
    how many unfolded waves are pending, so this should track
    bm25_search_streamed_product (one pending deletion wave) closely;
    a widening gap means the mask path regressed. First draw pays the
    one-time versioned build, the recorded median reflects the search."""
    from bharatmlstack_spark.queries_text import _BM25_TERMS
    from bharatmlstack_spark.streaming.ingest import bm25_search_streamed

    index_path = _prebuilt_multiwave_postings(spark, sf_dir)
    return bm25_search_streamed(spark, index_path, _BM25_TERMS, k=10)


def hybrid_search_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion through the two legs that actually ship at 100 TB:
    BM25 top-20 from the PREBUILT streamed postings index (one pending
    deletion wave — the masked read path) + IVF-PQ ANN top-20
    (cell-pruned ADC + exact re-rank). The registered-form twin
    (queries_text.hybrid_search_rrf, staged r15) runs both legs exact
    so DuckDB can recompute the fusion; this entry times the shipping
    composition. Fusion itself is a 40-row broadcast full-outer join —
    leg cost dominates by construction."""
    import numpy as np

    from bharatmlstack_spark.operators.ivfpq import IvfPqIndex
    from bharatmlstack_spark.queries_text import _BM25_TERMS
    from bharatmlstack_spark.streaming.ingest import bm25_search_streamed

    index_path = _prebuilt_streamed_postings(spark, sf_dir)
    lex = bm25_search_streamed(spark, index_path, _BM25_TERMS, k=20).select(
        "doc_id", F.col("rank").alias("lrank")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    cands = emb.filter(F.col("vec_id") >= 5)
    idx = IvfPqIndex(n_cells=16, m=16, k=64).fit(cands, sample_size=1024)
    vec = idx.search(
        idx.index(cands), np.array(qrow[0]), k=20,
        nprobe=8, rerank=cands, shortlist=100,
    ).select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("vrank"))
    from pyspark.sql import Window

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lrank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vrank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    wf = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "rrf_score", "rank")
    )


_STREAMED_CLUSTER_STATE: dict[str, str] = {}


def _prebuilt_cluster_state(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process) the incremental cluster state: the exact
    ngram-Jaccard pair set streamed in 3 hash-split waves through
    stream_cluster_sink — the same construction as the staged
    stream_dedup_clusters row."""
    path = _STREAMED_CLUSTER_STATE.get(sf_dir)
    if path:
        return path
    from bharatmlstack_spark.operators import dedup as DD
    from bharatmlstack_spark.query_registry import scratch_dir
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_cluster_sink,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.ngram_jaccard_pairs_prefix(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.8
    ).select("id_a", "id_b")
    work = scratch_dir("bmls_bench_clusters_")
    waves = pairs.withColumn("__w", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(3)))
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
        state_buckets=8,
        trigger_once=True,
    )
    await_stream(q, 1800, "stream_cluster_sink (bench prebuild)")
    _STREAMED_CLUSTER_STATE[sf_dir] = f"{work}/state"
    return _STREAMED_CLUSTER_STATE[sf_dir]


def dedup_clusters_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical cluster labels through the PREBUILT incremental cluster
    state — the read path a keep-one-per-cluster dedup decision serves at
    100 TB (ONE label scan + the broadcast-resolved merge forest),
    regression-guarded standalone: the registered dedup_components row
    times pair generation + full label propagation together. The first
    draw pays the one-time state build (pair set + 3 streamed waves), by
    design — the recorded median of >=3 draws reflects the read alone."""
    from bharatmlstack_spark.streaming.ingest import read_cluster_state

    return read_cluster_state(spark, _prebuilt_cluster_state(spark, sf_dir))


PRODUCT_QUERIES = {
    "ann_lsh_dot_product": ann_lsh_dot_product,
    "ann_ivf_dot_product": ann_ivf_dot_product,
    "pq_ann_topk_product": pq_ann_topk_product,
    "dedup_simhash_product": dedup_simhash_product,
    "dedup_minhash_lsh_product": dedup_minhash_lsh_product,
    "bm25_search_streamed_product": bm25_search_streamed_product,
    "bm25_search_multiwave_product": bm25_search_multiwave_product,
    "ann_ivfpq_product": ann_ivfpq_product,
    "dedup_clusters_product": dedup_clusters_product,
    "hybrid_search_product": hybrid_search_product,
}
