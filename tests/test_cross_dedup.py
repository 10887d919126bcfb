"""Cross-corpus MinHash-LSH dedup vs its DuckDB brute-force twin.
Originally the staged tier for queries_text.dedup_cross_corpus
(rotation protocol (b)); the row GRADUATED to the driver registry in
r11 on the multimodal_decode_rgb retirement slot — this test keeps
running the driver's exact comparison locally, now against the
registered oracle."""

import os

import duckdb
import pytest

from bharatmlstack_spark.operators.dedup import minhash_lsh_cross_pairs
from bharatmlstack_spark.query_registry import ORACLES
from bharatmlstack_spark.queries_text import dedup_cross_corpus

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _oracle_rows(con, sql, spark_cols):
    rel = con.sql(sql)
    assert sorted(rel.columns) == sorted(spark_cols)
    idx = [rel.columns.index(c) for c in sorted(spark_cols)]
    return sorted(tuple(r[i] for i in idx) for r in rel.fetchall())


def test_cross_corpus_matches_brute_force_oracle(spark, con):
    """Driver-identical comparison: same columns, order-insensitive
    values, vs the exact cross-Jaccard DuckDB twin."""
    out = dedup_cross_corpus(spark, SF_DIR)
    got = _rows(out)
    ref = _oracle_rows(con, ORACLES["dedup_cross_corpus"], out.columns)
    assert len(got) > 0  # vacuous-pass guard
    assert got == ref


def test_cross_pairs_never_include_within_corpus(spark):
    """The band join is A x B by construction: two identical docs INSIDE
    the incoming corpus must not produce a pair; the same text across
    corpora must."""
    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [
            (7, "alpha beta gamma delta epsilon zeta"),
            (8, "alpha beta gamma delta epsilon zeta"),
            (9, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_cross_pairs(a, b, threshold=0.8).collect()
    }
    assert pairs == {(1, 7), (1, 8)}  # no (7, 8) — within-B never pairs
