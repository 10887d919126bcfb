"""Retired registry rows vs their DuckDB oracles — the same
order-insensitive value comparison the round driver runs, applied to
every row in queries.RETIRED (unregistered from the 50-row driver gate
to free rotation slack, per the pinned retirement order; their operator
families stay driver-attested by the surviving siblings named in
queries.RETIRED). This test keeps each retired row executable and
verified on every pytest run."""

import os

import duckdb
import pytest

from bharatmlstack_spark import queries as Q
from bharatmlstack_spark.queries import RETIRED, RETIRED_ORACLES

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
    assert sorted(rel.columns) == sorted(spark_cols)
    idx = [rel.columns.index(c) for c in sorted(spark_cols)]
    return sorted(tuple(r[i] for i in idx) for r in rel.fetchall())


def test_retired_rows_have_functions_and_oracles():
    """Every executed retirement keeps an importable function and a
    staged oracle — retirement never silently deletes coverage."""
    assert RETIRED, "RETIRED list emptied but this test still exists"
    for name, _round, _why in RETIRED:
        assert callable(getattr(Q, name)), name
        assert name in RETIRED_ORACLES, name
        assert name not in Q.QUERY_PRIORITY, f"{name} retired but still prioritized"


@pytest.mark.parametrize("name", [r[0] for r in RETIRED])
def test_retired_row_matches_its_oracle(spark, con, name):
    """Exactly the driver's comparison, on the retired (query, oracle)
    pair: same columns, order-insensitive values."""
    out = getattr(Q, name)(spark, SF_DIR)
    got = _rows(out)
    ref = _oracle_rows(con, RETIRED_ORACLES[name], out.columns)
    assert len(got) > 0  # vacuous-pass guard
    assert got == ref
