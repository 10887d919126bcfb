"""Hybrid retrieval (RRF fusion of BM25 + vector dot legs): the STAGED
driver comparison for the pinned ``hybrid_search_rrf`` row (r15,
rotation protocol (b) — graduates via the third-generation candidate
list in queries.py when a rotation frees a slot), plus fusion
invariants the oracle equality alone doesn't spell out."""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def result(spark):
    from bharatmlstack_spark.queries_text import hybrid_search_rrf

    return hybrid_search_rrf(spark, SF_DIR).collect()


def test_hybrid_search_matches_duckdb_oracle(spark, result):
    """The driver's exact comparison on the STAGED (query, oracle) pair
    — both legs AND the fusion recomputed independently by DuckDB."""
    from bharatmlstack_spark.queries_text import STAGED_ORACLES

    cols = sorted(result[0].asDict().keys())
    got = sorted(tuple(r[c] for c in cols) for r in result)
    assert len(got) == 10

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rel = con.sql(STAGED_ORACLES["hybrid_search_rrf"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref


def test_rrf_values_are_rank_rationals(spark, result):
    """Every fused score must be expressible as 1/(60+i), 1/(60+j), or
    their sum for leg ranks i, j in 1..20 — the rank-only property that
    makes the fusion immune to the legs' incomparable score scales."""
    singles = {round(1.0 / (60 + i), 6) for i in range(1, 21)}
    pairs = {
        round(1.0 / (60 + i) + 1.0 / (60 + j), 6)
        for i in range(1, 21)
        for j in range(1, 21)
    }
    for r in result:
        assert r["rrf_score"] in singles | pairs, r


def test_both_legs_contribute(spark, result):
    """Fusion must actually merge two sources: the top-10 contains docs
    from BOTH legs (computed independently here via the same operators),
    and the ranking is strictly ordered. (Text and embeddings are
    independent synthetics, so leg OVERLAP in a 500-doc corpus is
    chance — docs carrying both legs exist only when it strikes; what
    is guaranteed is that each leg seeds some of the fused top-10.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bharatmlstack_spark.functions.vector import dot
    from bharatmlstack_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lex_ids = {
        r["doc_id"] for r in bm25_topk(docs, ["spark", "table", "query", "join"], k=20).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qcol = F.array(*[F.lit(float(v)) for v in qrow[0]])
    wv = Window.orderBy(F.desc("score"), F.asc("vec_id"))
    vec_ids = {
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") >= 5)
        .withColumn("score", dot(F.col("embedding"), qcol))
        .withColumn("vrank", F.row_number().over(wv))
        .filter(F.col("vrank") <= 20)
        .select("vec_id")
        .collect()
    }
    top_ids = {r["doc_id"] for r in result}
    assert top_ids & lex_ids, "no lexical-leg doc in the fused top-10"
    assert top_ids & vec_ids, "no vector-leg doc in the fused top-10"
    assert top_ids <= (lex_ids | vec_ids)
    ranks = [r["rank"] for r in sorted(result, key=lambda r: r["rank"])]
    assert ranks == list(range(1, 11))
