"""Corpus-construction query-oracle pairs: the operators that turn a raw
100 TB document/interaction dump into a training set — n-gram statistics,
test-set contamination detection, corpus mixing, negative sampling, data
profiling, and feature discretization.

Float discipline follows bharatmlstack_spark/queries.py: counts and hash
arithmetic are exact integers; the only float op here (quantile binning)
compares bucket IDs, not the interpolated boundaries themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bharatmlstack_spark.operators import dedup as DD
from bharatmlstack_spark.operators import profile as PR
from bharatmlstack_spark.operators import sampling as SP
from bharatmlstack_spark.operators.dedup import word_shingles
from bharatmlstack_spark.operators.graph import connected_components
from bharatmlstack_spark.query_registry import (
    RETIRED_ORACLES,
    defer_unpersist,
    query,
    scratch_dir,
)
from bharatmlstack_spark.sources.events import load_events_raw
from bharatmlstack_spark.queries_text import (
    CORPUS_SQL,
    STAGED_ORACLES,
    _SHINGLE_SQL,
    corpus,
)

# ---------------------------------------------------------------------------
# corpus n-gram statistics (count-based LM data prep / vocab building)
# ---------------------------------------------------------------------------


@query(
    "ngram_topk",
    oracle=r"""
WITH wordlists AS (
  SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents
),
bigrams AS (
  SELECT unnest([ws[i] || ' ' || ws[i+1] FOR i IN generate_series(1, len(ws) - 1)]) AS ngram
  FROM wordlists WHERE len(ws) >= 2
)
SELECT ngram, COUNT(*) AS cnt
FROM bigrams GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 20
""",
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k bigrams (vocabulary/statistics pass). zip_with
    of the two shifted word arrays keeps n-gram construction JVM-side; the
    global top-20 is TakeOrderedAndProject (per-partition heaps), never a
    full sort."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.filter(F.size(ws) >= 2)
        .select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# benchmark-contamination check (train docs sharing 5-grams with test docs)
# ---------------------------------------------------------------------------


@query(
    "contamination_check",
    oracle=f"""
WITH {CORPUS_SQL.strip()},
split AS (
  SELECT doc_id, text,
         CASE WHEN ((doc_id % 1048576) * 2654435761 + (doc_id // 1048576) * 40503) % 100 < 80 THEN 'train' ELSE 'test' END AS split
  FROM corpus
),
wordlists AS (
  SELECT doc_id, split, string_split_regex(trim(text), '\\s+') AS ws FROM split
),
shingles AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(ws) >= 5
      THEN [array_to_string(ws[i:i+4], ' ') FOR i IN generate_series(1, len(ws) - 4)]
      ELSE [array_to_string(ws, ' ')] END
  )) AS shingle
  FROM wordlists
)
SELECT tr.doc_id, COUNT(DISTINCT tr.shingle) AS n_shared
FROM shingles tr JOIN shingles te USING (shingle)
WHERE tr.split = 'train' AND te.split = 'test'
GROUP BY tr.doc_id
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: train docs sharing >= 1 distinct 5-gram
    with any test doc, with the count of contaminated 5-grams. The shingle
    equi-join only meets docs that actually share an n-gram (key-local,
    never O(n^2)); the injected duplicate corpus guarantees known
    positives whenever a doc and its copy land in different splits."""
    c = corpus(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < par:
        c = c.repartition(par)  # spread the 5-gram map off the 3 union branches
    split = F.when(
        SP.knuth_mix(F.col("doc_id")) % 100 < 80, F.lit("train")
    ).otherwise(F.lit("test"))
    sh = c.select(
        "doc_id", split.alias("split"), F.explode(word_shingles("text", n=5)).alias("shingle")
    )
    tr = sh.filter(F.col("split") == "train").select("doc_id", "shingle")
    te = sh.filter(F.col("split") == "test").select(F.col("shingle")).distinct()
    return (
        tr.join(te, on="shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# corpus mixing (per-language sampling rates)
# ---------------------------------------------------------------------------

_MIX_RATES = {"en": 1.0, "es": 0.5, "de": 0.25, "fr": 0.1, "zh": 0.05}


@query(
    "corpus_mix_sample",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE ((doc_id % 1048576) * 2654435761 + (doc_id // 1048576) * 40503) % 10000 < (
  CASE lang WHEN 'en' THEN 1.0 WHEN 'es' THEN 0.5 WHEN 'de' THEN 0.25
            WHEN 'fr' THEN 0.1 WHEN 'zh' THEN 0.05 ELSE 0.0 END) * 10000
""",
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language re-weighting for a training mix: keep each doc with
    a per-stratum rate, decided by a deterministic key hash — a pure
    scan-level filter (no shuffle, pushdown-able), with nested-sample
    reproducibility across rate changes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return SP.mix_sample(d, strata_col="lang", id_col="doc_id", rates=_MIX_RATES).select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# negative sampling (implicit-feedback training pairs)
# ---------------------------------------------------------------------------


@query(
    "negative_sampling",
    oracle="""
WITH u AS (SELECT c_custkey FROM customer WHERE c_custkey % 30 = 0),
i AS (SELECT p_partkey FROM part WHERE p_partkey % 20 = 0),
pos AS (
  SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS p_partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
cand AS (
  SELECT u.c_custkey, i.p_partkey FROM u CROSS JOIN i
  ANTI JOIN pos ON pos.c_custkey = u.c_custkey AND pos.p_partkey = i.p_partkey
),
ranked AS (
  SELECT c_custkey, p_partkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_custkey
           ORDER BY ((c_custkey % 1048576) * 1000003 + (c_custkey // 1048576) * 7919
                     + (p_partkey % 1048576) * 2654435761 + (p_partkey // 1048576) * 40503) % 999999937, p_partkey
         ) AS rn
  FROM cand
)
SELECT c_custkey, p_partkey FROM ranked WHERE rn <= 5
""",
)
def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user negative items for implicit-feedback training: hash-bounded
    user/item pools -> cross join (broadcast items) -> anti-join against
    observed (cust, part) purchases -> deterministic per-user top-5 by
    key hash. The interactions fact is touched once, projected to 2 cols."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_custkey") % 30 == 0
    )
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_partkey") % 20 == 0
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # restrict positives to the sampled pools AT THE SCANS (guide §3.2 /
    # §6): only purchases by a pooled user of a pooled item can ever
    # eliminate a candidate pair, so filtering here changes nothing —
    # but the literal predicates push down to the parquet scans and the
    # orders⋈lineitem join shrinks by the product of the two sampling
    # rates instead of joining the full fact
    pos = (
        orders.filter(F.col("o_custkey") % 30 == 0)
        .join(
            li.filter(F.col("l_partkey") % 20 == 0),
            li.l_orderkey == orders.o_orderkey,
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
    )
    return SP.negative_sample(
        pos, user_col="c_custkey", item_col="p_partkey", users=cust, items=parts, k=5
    )


# ---------------------------------------------------------------------------
# data-quality profile (ingest-time validation pass)
# ---------------------------------------------------------------------------


@query(
    "table_profile",
    oracle="""
SELECT 'o_orderkey' AS column_name,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS vmin, CAST(MAX(o_orderkey) AS DOUBLE) AS vmax
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_totalprice), CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT o_orderstatus), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM orders
""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (nulls / exact distincts / numeric
    range) in ONE aggregate pass; the row-per-column explode runs on the
    single agg row. min/max for doubles are exact (no float summation)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return PR.profile_table(
        o, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    )


# ---------------------------------------------------------------------------
# feature discretization (equal-frequency binning)
# ---------------------------------------------------------------------------


@query(
    "quantile_binning",
    oracle="""
WITH b AS (
  SELECT quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
  FROM orders
)
SELECT o_orderkey, 1 + len(list_filter(bs, x -> o_totalprice > x)) AS bucket
FROM orders, b
""",
)
def quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning of order value: exact interpolated boundaries in one
    agg (reference percentile semantics — numerix fp32_ops.rs:334-348),
    assignment via broadcast boundary array — no global sort / ntile
    single-partition window. Compares bucket IDs (integers), not floats."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return PR.quantile_bin(o, value_col="o_totalprice", n_buckets=10, keep=["o_orderkey"]).select(
        "o_orderkey", "bucket"
    )


# ---------------------------------------------------------------------------
# dedup clustering: pairwise matches -> connected components
# ---------------------------------------------------------------------------


@query(
    "dedup_components",
    oracle=f"""
WITH RECURSIVE {CORPUS_SQL.strip()},
{_SHINGLE_SQL.strip()},
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(ni AS DOUBLE) / CAST(sa.set_size + sb.set_size - ni AS DOUBLE) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node, MIN(lab) AS component FROM reach GROUP BY node
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: Jaccard>=0.8 pairs -> connected components
    (iterative min-label propagation, one edge-shuffle per round, diameter
    rounds). The step that turns pairwise matches into keep-one-per-cluster
    dedup decisions. Oracle = DuckDB recursive CTE reachability."""
    pairs = DD.ngram_jaccard_pairs_prefix(
        corpus(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=0.8
    )
    return connected_components(pairs.select("id_a", "id_b"))


@query(
    "dedup_survivors",
    oracle=f"""
WITH RECURSIVE {CORPUS_SQL.strip()},
{_SHINGLE_SQL.strip()},
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(ni AS DOUBLE) / CAST(sa.set_size + sb.set_size - ni AS DOUBLE) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
),
dropped AS (
  SELECT node FROM reach GROUP BY node HAVING node != MIN(lab)
)
SELECT c.doc_id, c.lang FROM corpus c
ANTI JOIN dropped d ON c.doc_id = d.node
""",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus: near-dup clusters keep their minimum doc_id,
    every other cluster member is dropped — pairs -> components ->
    anti-join, the complete keep-one-per-cluster dedup decision in one
    composable plan (the demo's step 4, oracle-checked)."""
    c = corpus(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs_prefix(
        c, id_col="doc_id", text_col="text", n=3, threshold=0.8
    )
    comps = connected_components(pairs.select("id_a", "id_b"))
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return c.join(dropped, on="doc_id", how="left_anti").select("doc_id", "lang")


# STAGED (r15, rotation protocol (b) — graduates via the third-generation
# candidate list in queries.py when a rotation frees a slot): the
# INCREMENTAL form of dedup_components. Oracle = the identical recursive
# CTE — connected components are independent of edge arrival order, so
# the maintained labels must equal the one-shot computation under any
# batching or redelivery. Driver comparison replicated in
# tests/test_stream_clusters.py.
STAGED_ORACLES["stream_dedup_clusters"] = f"""
WITH RECURSIVE {CORPUS_SQL.strip()},
{_SHINGLE_SQL.strip()},
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(ni AS DOUBLE) / CAST(sa.set_size + sb.set_size - ni AS DOUBLE) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, lab) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node, MIN(lab) AS component FROM reach GROUP BY node
"""


def stream_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally MAINTAINED dedup clusters: the exact near-dup pair
    set streams in 3 hash-split micro-batch waves (multi-edge clusters
    span waves, so established components MERGE mid-stream), and
    streaming.ingest.stream_cluster_sink folds each wave into a
    persisted union-find — per-batch cost O(batch + touched clusters),
    never a recompute over the accumulated corpus. The whole topic then
    REPLAYS under a fresh checkpoint (full at-least-once redelivery),
    which appends nothing (the sink is idempotent in rows). Readout =
    read_cluster_state: one label scan + the broadcast-resolved merge
    log. Oracle = dedup_components' recursive CTE — order-independence
    of connected components makes the one-shot set the exact spec."""
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        read_cluster_state,
        stream_cluster_sink,
    )

    pairs = DD.ngram_jaccard_pairs_prefix(
        corpus(spark, sf_dir), id_col="doc_id", text_col="text", n=3, threshold=0.8
    ).select("id_a", "id_b")
    work = scratch_dir("bmls_clusters_")
    topic = f"{work}/topic"
    waves = pairs.withColumn(
        "__w", F.pmod(F.xxhash64(F.col("id_a"), F.col("id_b")), F.lit(3))
    )
    for w in range(3):
        waves.filter(F.col("__w") == w).drop("__w").coalesce(1).write.mode(
            "append"
        ).parquet(topic)
    for replay in ("ckpt1", "ckpt2"):  # second pass = full redelivery
        stream = (
            spark.readStream.schema("id_a bigint, id_b bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(topic)
        )
        q = stream_cluster_sink(
            stream,
            state_dir=f"{work}/state",
            checkpoint_dir=f"{work}/{replay}",
            spark=spark,
            state_buckets=8,
            trigger_once=True,
        )
        await_stream(q, 300)
    return read_cluster_state(spark, f"{work}/state")


# ---------------------------------------------------------------------------
# cardinality sketch (the 100 TB distinct-count path)
# ---------------------------------------------------------------------------


@query(
    "sketch_distinct_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
""",
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd 1%) per event_type — the
    sketch-based path for distinct counts at 100 TB, where exact
    countDistinct's per-group dedup shuffle is the bottleneck.

    Invariant-check form: HLL estimates are engine-specific, so the
    deliverable rows carry the EXACT distinct count (DuckDB recomputes
    it) plus ``within_bound`` asserting the sketch landed within 5% —
    a hard green that certifies the sketch without pretending DuckDB
    has HLL++. The exact side exists only for verification."""
    ev = load_events_raw(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__approx"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("__approx") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("within_bound"),
    )


RETIRED_ORACLES["sketch_union_distinct"] = """
SELECT COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events
"""


def sketch_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE HLL sketches — the actual 100 TB distinct-count pattern:
    per-group (or per-partition, per-day, ...) hll_sketch_agg partials
    union via hll_union_agg into one global estimate WITHOUT re-touching
    rows. Invariant-check form: the deliverable is the exact global
    distinct count (DuckDB recomputes it) plus a 5% bound on the merged
    sketch's estimate — certifying the merge path, not just one sketch.

    RETIRED from the driver registry in r14 (head of the pinned
    retirement order): sketches stay driver-attested by
    sketch_distinct_users + sketch_percentile_value (both r13-green);
    the freed slot registers stream_phrase_search — exact phrase search
    through the POSITIONAL streamed postings index, exactly as the r13
    verdict's task 2 prescribed. Still verified every pytest run
    against its DuckDB oracle (tests/test_staged_retired.py)."""
    ev = load_events_raw(spark, sf_dir)
    per_type = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("__sk")
    )
    merged = per_type.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(__sk))").alias("__est")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_users",
        (
            F.abs(F.col("__est") - F.col("exact_users")) / F.col("exact_users")
            <= 0.05
        ).alias("within_bound"),
    )


@query(
    "sketch_percentile_value",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
       ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
       ROUND(quantile_cont(value, 0.99), 6) AS p99_exact,
       TRUE AS rank_ok
FROM events GROUP BY event_type
""",
)
def sketch_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style mergeable sketch) p50/p95/p99 per
    event_type — the percentile path at 100 TB, where exact percentile's
    per-group sorted buffer stops fitting.

    Invariant-check form: the deliverable rows are the EXACT interpolated
    percentiles (DuckDB quantile_cont recomputes them) plus ``rank_ok``
    asserting each sketch estimate sits within 1% RANK error — tie-safe
    two-sided bound: fraction(< approx) <= q + tol and
    fraction(<= approx) >= q - tol. approx_percentile(accuracy=10000)
    guarantees 1e-4, so the bound has two orders of margin."""
    ev = load_events_raw(spark, sf_dir).select("event_type", "value")
    appr = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)").alias("__ap")
    )
    joined = ev.join(F.broadcast(appr), "event_type")
    n = F.count(F.lit(1))

    def _le(i: int) -> Column:
        return F.sum((F.col("value") <= F.element_at("__ap", i)).cast("long")) / n

    def _lt(i: int) -> Column:
        return F.sum((F.col("value") < F.element_at("__ap", i)).cast("long")) / n

    agg = joined.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95_exact"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_exact"),
        _le(1).alias("__le50"), _lt(1).alias("__lt50"),
        _le(2).alias("__le95"), _lt(2).alias("__lt95"),
        _le(3).alias("__le99"), _lt(3).alias("__lt99"),
    )
    tol = 0.01
    ok = (
        (F.col("__le50") >= 0.5 - tol) & (F.col("__lt50") <= 0.5 + tol)
        & (F.col("__le95") >= 0.95 - tol) & (F.col("__lt95") <= 0.95 + tol)
        & (F.col("__le99") >= 0.99 - tol) & (F.col("__lt99") <= 0.99 + tol)
    )
    return agg.select(
        "event_type", "p50_exact", "p95_exact", "p99_exact", ok.alias("rank_ok")
    )


# ---------------------------------------------------------------------------
# chunking + sequence packing (corpus -> fixed-budget training sequences)
# ---------------------------------------------------------------------------


@query(
    "doc_chunks",
    oracle=r"""
WITH wordlists AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
),
chunked AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(ws[i*40+1 : i*40+50], ' ') AS chunk_text
  FROM wordlists,
       UNNEST(generate_series(0, CAST(ceil(greatest(len(ws) - 50, 0) / 40.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, chunk_idx, chunk_text,
       CAST(len(string_split_regex(chunk_text, '\s+')) AS INT) AS n_words
FROM chunked
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking (window 50, stride 40): pure
    per-row array ops + posexplode — map-side, no shuffle, scan-bandwidth
    at 100 TB."""
    from bharatmlstack_spark.operators.chunking import chunk_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(d, id_col="doc_id", text_col="text", window=50, stride=40)
    return out.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"), "chunk_text",
        F.col("n_words").cast("int").alias("n_words"),
    )


@query(
    "sequence_packing",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM toks
)
SELECT doc_id, shard,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS bin,
       CAST(cum - n_tokens AS BIGINT) AS tokens_before
FROM packed
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing to a 512-token budget, sharded
    by doc hash so no executor ever windows the whole corpus — one
    cumsum window per shard, deterministic given the data."""
    from bharatmlstack_spark.operators.chunking import pack_sequences
    from bharatmlstack_spark.functions import text as TX

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", TX.word_count("text").cast("bigint").alias("n_tokens")
    )
    return pack_sequences(d, id_col="doc_id", token_col="n_tokens", budget=512, n_shards=8)


# ---------------------------------------------------------------------------
# TF-IDF (term weighting for retrieval / keyword extraction)
# ---------------------------------------------------------------------------


@query(
    "tfidf_top_terms",
    oracle=r"""
WITH tokens AS (
  SELECT doc_id, lower(unnest(string_split_regex(trim(coalesce(text, '')), '\s+'))) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tokens),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 5 AND doc_id < 100
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF, top-5 terms per doc (first 100 docs): token
    explode -> two key-local aggregates (term df broadcasts back) -> per-
    doc top-k window. The df table is vocabulary-sized, tiny next to the
    corpus; rounded 6dp (ln is IEEE-identical, the product fold is not).
    n_docs folds in as a 1-row broadcast cross join — ONE documents scan
    in the plan, no driver-side count action."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # coalesce keeps NULL-text docs in the token stream (as the '' term, same
    # as empty text) so both engines' n_docs = countDistinct over tokens
    # stays symmetric with the oracle CTE — no second documents scan needed
    tokens = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
        ).alias("term"),
    )
    # tf is consumed by three branches (df agg, corpus-size agg, scoring):
    # materialize it ONCE so the scan + explode + first shuffle never repeat.
    # tf is the per-(doc, term) table — dedup'd counts, far smaller than the
    # raw token stream it summarizes.
    tf = defer_unpersist(
        tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a 1-row broadcast cross join — no driver-side count
    # action, no second documents scan (every doc has >=1 token row: even
    # empty text yields the '' term in both engines)
    n = tf.agg(F.countDistinct("doc_id").cast("double").alias("__n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(F.broadcast(n))  # 1-row cross join, broadcast — no shuffle
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    # doc_id < 100 BEFORE the window: it filters whole window partitions
    # (doc_id is the partition key) so it commutes with row_number, but
    # Catalyst leaves the conjunction above the Window — pushed by hand,
    # the rank exchange carries only the requested docs' scored rows
    # instead of the whole corpus's (plans/r16/tfidf_top_terms_*.txt)
    return (
        scored.filter(F.col("doc_id") < 100)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# schema-version reconciliation on read (SURVEY §1.1.4, retrieve.go:833-858)
# ---------------------------------------------------------------------------


@query(
    "feature_schema_evolution",
    oracle="""
SELECT c_custkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS profile__balance_cents,
       CASE WHEN c_custkey % 2 = 1 THEN c_nationkey ELSE -1 END AS profile__nation
FROM customer
WHERE c_custkey % 7 = 0
""",
)
def feature_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows written under FG schema v1 served against active v2: the
    feature absent from the stored version resolves to its registered
    default, per row (retrieve.go:833-858 reconcile). Even customer keys
    carry v1 blocks (no `nation` slot -> default -1), odd keys v2. The
    whole reconcile is the same single broadcast-key left join + coalesce
    plan as every retrieve — versioning adds zero extra passes."""
    from bharatmlstack_spark.operators.feature_store import FeatureStore
    from bharatmlstack_spark.registry import (
        DataType,
        Entity,
        Feature,
        FeatureGroup,
        SchemaRegistry,
    )

    reg = SchemaRegistry()
    reg.register(
        Entity(
            "customer",
            ["c_custkey"],
            {
                "profile": FeatureGroup(
                    "profile",
                    1,
                    DataType.INT64,
                    features={
                        1: [Feature("balance_cents", 0, default=0)],
                        2: [
                            Feature("balance_cents", 0, default=0),
                            Feature("nation", 1, default=-1),
                        ],
                    },
                    active_version=2,
                )
            },
        )
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    version = (F.lit(1) + (F.col("c_custkey") % 2)).cast("int")
    stored = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("profile__balance_cents"),
        F.when(F.col("c_custkey") % 2 == 1, F.col("c_nationkey"))
        .otherwise(F.lit(None))
        .cast("bigint")
        .alias("profile__nation"),
        version.alias("schema_version"),
    )
    keys = c.filter(F.col("c_custkey") % 7 == 0).select("c_custkey")
    fs = FeatureStore(spark, reg, "/tmp/__bmls_schema_evo_unused")
    return fs.retrieve(
        "customer", {"profile": ["balance_cents", "nation"]}, keys, feature_table=stored
    )


# ---------------------------------------------------------------------------
# heavy hitters: two-pass frequent items (the no-full-shuffle top path)
# ---------------------------------------------------------------------------


@query(
    "heavy_hitters_twopass",
    oracle="""
WITH w AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
),
f AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM w
  WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
  GROUP BY w
),
n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM f)
SELECT f.w AS word, f.cnt FROM f, n WHERE f.cnt * 200 >= 7 * n.n
""",
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (words with frequency >= 3.5% of all tokens)
    via the TWO-PASS candidate/recount shape: pass 1 emits each
    partition's local top-4096 values from one Arrow-batched
    value_counts (a bounded candidate set — no full-vocabulary shuffle);
    pass 2 broadcasts the candidates back onto the scan and counts ONLY
    them exactly, then applies the integer threshold. Every emitted row
    is exact, so DuckDB's full groupBy recomputes the identical set —
    a candidate miss (the only possible approximation) would drop a row
    and turn the gate red. At 100 TB this replaces ngram_topk's
    full-cardinality shuffle with 2 scans + a candidate-sized shuffle;
    see operators/profile.heavy_hitters."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    words = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))
    out = PR.heavy_hitters(words, "w", threshold_num=7, threshold_den=200)
    return out.select(F.col("value").alias("word"), "cnt")
