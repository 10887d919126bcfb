"""ANN-search-through-a-refit-index vs its DuckDB brute-force twin —
the staged tier that graduated queries_text.ann_refit_search into the
registry in r12 (rotation protocol (b): the driver's exact comparison
ran here through r11 until the knn_dot retirement freed a slot;
dedup_cross_corpus and the r09 retrieval rows graduated the same way —
and like tests/test_cross_dedup.py this keeps running post-graduation).
One run gates refit content preservation, redelivery dedup, and
exact-duplicate recall at nprobe=1 — see the query docstring."""

import os

import duckdb
import pytest

from bharatmlstack_spark.query_registry import ORACLES
from bharatmlstack_spark.queries_text import ann_refit_search

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
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


def test_ann_refit_search_matches_brute_force_oracle(spark, con):
    """Driver-identical comparison: same columns, order-insensitive
    values, vs the exact brute-force cosine top-2 DuckDB twin."""
    out = ann_refit_search(spark, SF_DIR)
    got = _rows(out)
    ref = _oracle_rows(con, ORACLES["ann_refit_search"], out.columns)
    assert len(got) > 0  # vacuous-pass guard
    assert got == ref
