"""BM25 / PMI collocation / char-entropy vs DuckDB twins — the same
order-insensitive value comparison the round driver runs, applied to the
round-9 registration candidates staged in queries_text.R9_ORACLES ahead
of their driver rows (operators/retrieval.py, functions/text.char_entropy)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.functions.text import char_entropy
from bharatmlstack_spark.operators.retrieval import bm25_topk, collocation_pmi
from bharatmlstack_spark.queries_text import (
    R9_ORACLES,
    bigram_pmi_q,
    bm25_topk_q,
    char_entropy_quality_q,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _oracle_rows(con, sql, spark_cols):
    rel = con.sql(sql)
    idx = [rel.columns.index(c) for c in sorted(spark_cols)]
    assert sorted(rel.columns) == sorted(spark_cols)
    return sorted(tuple(r[i] for i in idx) for r in rel.fetchall())


@pytest.mark.parametrize(
    "name, fn",
    [
        ("bm25_topk", bm25_topk_q),
        ("bigram_pmi", bigram_pmi_q),
        ("char_entropy_quality", char_entropy_quality_q),
    ],
)
def test_r9_candidate_matches_its_staged_oracle(spark, con, name, fn):
    """Exactly the driver's comparison: same columns, order-insensitive
    values, on the staged (query, oracle) pair that round 9 registers."""
    out = fn(spark, SF_DIR)
    got = _rows(out)
    ref = _oracle_rows(con, R9_ORACLES[name], out.columns)
    assert len(got) > 0  # vacuous-pass guard
    assert got == ref


def test_bm25_absent_term_contributes_nothing(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    terms = ["spark", "table", "query", "join"]
    base = {
        (r["doc_id"], r["rank"]): r["score"]
        for r in bm25_topk(docs, terms, k=10).collect()
    }
    plus = {
        (r["doc_id"], r["rank"]): r["score"]
        for r in bm25_topk(docs, terms + ["zz_nonexistent_zz"], k=10).collect()
    }
    assert base == plus  # df=0 terms generate no postings, no score shift


def test_pmi_min_count_prunes(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lo = collocation_pmi(docs, min_count=1, k=10_000).count()
    hi = collocation_pmi(docs, min_count=50, k=10_000).count()
    assert hi < lo


def test_char_entropy_closed_forms(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, None)], ["i", "t"]
    )
    got = {r["i"]: r["e"] for r in df.select("i", char_entropy("t").alias("e")).collect()}
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(math.log(2.0))
    assert got[3] == 0.0 and got[4] == 0.0


def test_r9_oracles_emit_no_driver_unsafe_types(con):
    """Same lint the registry-wide test applies to registered oracles:
    no HUGEINT/DECIMAL (they hash as floats through arrow/pandas)."""
    for name, sql in R9_ORACLES.items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (r[0], r[1])
            for r in desc
            if "HUGEINT" in str(r[1]).upper() or "DECIMAL" in str(r[1]).upper()
        ]
        assert not bad, f"{name}: {bad}"


def test_semantic_dedup_ivf_matches_staged_oracle(spark, con):
    from bharatmlstack_spark.queries_text import semantic_dedup_ivf_q

    out = semantic_dedup_ivf_q(spark, SF_DIR)
    got = _rows(out)
    ref = _oracle_rows(con, R9_ORACLES["semantic_dedup_ivf"], out.columns)
    assert len(got) > 0  # vacuous-pass guard
    assert got == ref


def test_semantic_dedup_ivf_prunes_to_clusters(spark):
    """The candidate generator must be cluster-local: within-cell pair
    count strictly below the all-pairs count on a corpus the quantizer
    actually splits (> 1 non-empty cell)."""
    from bharatmlstack_spark.operators.dedup import embedding_semantic_dedup_pairs
    from bharatmlstack_spark.operators.lsh import IvfIndex

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    idx = IvfIndex(n_cells=8).fit(e, sample_size=256, iters=2)
    cells = idx.index(e)
    n_cells = cells.select("cell").distinct().count()
    assert n_cells > 1
    cand = embedding_semantic_dedup_pairs(
        e, threshold=-2.0, n_cells=8, sample_size=256, iters=2
    ).count()
    assert cand < n * (n - 1) // 2


def test_r9_candidates_hold_their_shuffle_budgets(spark):
    """Same contract the registered rows carry in test_plans: the staged
    rows enter round 9 with a pinned physical shape — a refactor that
    adds an exchange or a cartesian product fails before registration."""
    from bharatmlstack_spark.plans import explain_formatted, shuffle_count
    from bharatmlstack_spark.queries_text import semantic_dedup_ivf_q

    # pin the COLD plan shape: earlier tests' persisted sub-frames would
    # otherwise swap InMemoryRelations into these plans and shift the
    # exchange count with test order
    spark.catalog.clearCache()
    budgets = {
        "bm25_topk": (bm25_topk_q, 4),      # tf agg + df agg + doc agg + top-k
        "bigram_pmi": (bigram_pmi_q, 4),    # unigram agg + bigram agg + join + rank
        "char_entropy_quality": (char_entropy_quality_q, 0),  # pure scan map
        "semantic_dedup_ivf": (semantic_dedup_ivf_q, 0),      # cell-local self-join
    }
    for name, (fn, budget) in budgets.items():
        df = fn(spark, SF_DIR)
        plan = explain_formatted(df)
        assert shuffle_count(df) <= budget, (name, shuffle_count(df))
        assert "Cartesian" not in plan, name
