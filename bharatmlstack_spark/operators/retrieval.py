"""Sparse-retrieval operators over the document corpus: Okapi BM25
ranking and PMI collocation mining — the classic lexical-retrieval and
phrase-induction steps of a training-data pipeline (query-based corpus
curation, tokenizer/vocab phrase candidates).

Beyond-the-reference LLM-data-pipeline family (like dedup/ANN/BPE):
nothing in BharatMLStack serves these; they complete the text toolkit
next to tfidf_top_terms (queries_corpus.py).

Scale notes (100 TB corpus):

- ``bm25_topk`` never shuffles the corpus. The only shuffled rows are
  the postings of the QUERY terms (filtered map-side before the tf
  aggregate), the corpus stats fold in as a 1-row broadcast, and the
  final ranking is a heap top-k. Cost ~ scan + |query postings|.
- ``collocation_pmi`` pays one corpus-wide bigram-count shuffle and one
  unigram-count shuffle (both partial-aggregated map-side), then joins
  bigrams to the vocabulary-sized unigram table on the word — vocab
  grows sub-linearly in corpus size (Heaps' law), and the min_count
  filter applies BEFORE the unigram joins so only candidate phrases
  shuffle twice.

Round-9 registration candidates: these back the staged ``bm25_topk`` /
``bigram_pmi`` query rows (queries_text.py ``R9_ORACLES`` + ``*_q``
functions) — driver rows land when the round-9 window rotates the
r06-era block and frees slots (see QUERY_PRIORITY in queries.py).
Verified today by DuckDB-twin pytest (tests/test_retrieval.py), same
comparison the driver runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bharatmlstack_spark.query_registry import defer_unpersist


def _tokens(text_col: str) -> Column:
    """Whitespace tokens, lowercased; NULL text behaves as empty (the
    corpus-wide convention, see tfidf_top_terms)."""
    return F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 (Robertson & Walker; the Lucene idf variant): rank the
    top-``k`` documents for a bag of ``query_terms``.

    score(d) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))
    idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

    |d| = whitespace token count, N = corpus size, avgdl = mean |d|.
    Returns (doc_id, score, rank) with rank 1..k by (score desc, id asc).

    Plan: one scan computes per-doc length AND the query-term postings
    (term filter applied map-side, so only matching tokens reach the tf
    shuffle); a second map-side-partial aggregate folds N/avgdl into a
    1-row broadcast; df(t) derives from the tf table (|terms| rows,
    broadcast). The corpus itself is never shuffled and the final rank
    is TakeOrderedAndProject, not a global sort.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.size(_tokens(text_col)).alias("dl"),
        F.explode(_tokens(text_col)).alias("term"),
    )
    # corpus stats from the doc frame (map-side partial agg -> 1 row)
    stats = docs.select(F.size(_tokens(text_col)).alias("dl")).agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("dl").alias("__avgdl"),
    )
    # tf feeds two branches (df derivation + scoring): persist the
    # query-term postings (tiny — |matching docs| x |terms| rows) so the
    # corpus scan + postings shuffle run once, not once per branch
    tf = defer_unpersist(
        toks.filter(F.col("term").isin(terms))  # map-side, before the shuffle
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl"))
        .persist()
    )
    return bm25_score_topk(tf, stats, k1=k1, b=b, k=k, id_alias=id_col)


def bm25_score_topk(
    tf: DataFrame,
    stats: DataFrame,
    k1: float,
    b: float,
    k: int,
    id_alias: str,
) -> DataFrame:
    """The BM25 scoring tail shared by bm25_topk and the streamed-index
    search (streaming/ingest.bm25_search_streamed): df derivation from
    the postings, broadcast idf/stats fold, per-doc sum rounded to 6dp,
    heap top-k + rank. ONE implementation on purpose — both callers are
    gated by the same DuckDB twin, and two hand-synced copies of the
    formula would let a constant tweak break one silently.

    ``tf``: (term, id, tf, dl) postings for the query terms only;
    ``stats``: one row (__n_docs, __avgdl). Returns (id_alias, score,
    rank) with rank 1..k by (score desc, id asc)."""
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        1.0 + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(F.broadcast(stats))  # 1-row cross join, no shuffle
        .select("id", (idf * F.col("tf") * (k1 + 1.0) / denom).alias("s"))
        .groupBy("id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)  # heap top-k; the window below ranks only k rows
        .withColumn("rank", F.row_number().over(w))
        .select(F.col("id").alias(id_alias), "score", "rank")
    )


def collocation_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Pointwise mutual information over adjacent word bigrams (Church &
    Hanks 1990) — the collocation/phrase-candidate miner that feeds
    tokenizer vocab building ("new york"-style merges before BPE).

    pmi(a b) = ln( (c(ab)/B) / ( (c(a)/U) * (c(b)/U) ) )

    with B = total bigrams, U = total unigrams, corpus-wide counts.
    Returns the top-``k`` bigrams with c(ab) >= min_count by
    (pmi desc, w1 asc, w2 asc): (w1, w2, n_pair, pmi).

    Plan: bigram and unigram counts are partial-aggregated map-side;
    the min_count filter prunes BEFORE the two unigram joins, so only
    candidate phrases (not the corpus) shuffle through them. Unigram
    side is vocabulary-sized (Heaps' law) — joined on the word, not
    broadcast, so a 10^8-type vocabulary still works.
    """
    ws = docs.select(_tokens(text_col).alias("w")).filter(F.size("w") >= 2)
    bigrams = ws.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("w"), i + 1).alias("w1"),
                    F.element_at(F.col("w"), i + 2).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    unigrams = docs.select(F.explode(_tokens(text_col)).alias("w"))

    # both count tables feed two branches each (totals + the joins):
    # persist them (vocabulary-sized, Heaps' law) so the corpus-wide
    # explode+count shuffles run once, not once per consumer
    bcnt = defer_unpersist(
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("n_pair"))
        .persist()
    )
    ucnt = defer_unpersist(
        unigrams.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("n_w")).persist()
    )
    totals = (
        bcnt.agg(F.sum("n_pair").alias("__b"))
        .crossJoin(ucnt.agg(F.sum("n_w").alias("__u")))
    )

    cand = bcnt.filter(F.col("n_pair") >= min_count)
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("n_w").alias("n1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("n_w").alias("n2"))
    pmi = F.log(
        (F.col("n_pair") / F.col("__b"))
        / ((F.col("n1") / F.col("__u")) * (F.col("n2") / F.col("__u")))
    )
    return (
        cand.join(u1, on="w1")
        .join(u2, on="w2")
        .join(F.broadcast(totals))  # 1-row cross join
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        # total tie-break order -> a deterministic top-k set; heap
        # (TakeOrderedAndProject), never a global sort
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
