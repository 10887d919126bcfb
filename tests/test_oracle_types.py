"""Registry-wide oracle type lint: no oracle may emit HUGEINT/DECIMAL.

The driver fetches oracle results through arrow/pandas, where DuckDB
HUGEINT/DECIMAL (any un-CAST SUM over integers) becomes decimal128 ->
float64 and "3" hashes as "3.0" — a hash-fail even when values match.
DESCRIBE (not the DBAPI cursor, whose type codes are coarse) reports the
real logical types. Pure-DuckDB test: no SparkSession needed.
"""

import os

import duckdb
import pytest

from bharatmlstack_spark.queries import all_oracles

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_no_oracle_emits_driver_unsafe_types(con):
    offenders = {}
    for name, sql in all_oracles().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (r[0], r[1])
            for r in desc
            if "HUGEINT" in str(r[1]).upper() or "DECIMAL" in str(r[1]).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles emitting HUGEINT/DECIMAL columns (driver hash-fail): "
        f"{offenders} — CAST to BIGINT/DOUBLE in the oracle SQL"
    )


def test_no_oracle_multiplies_raw_column_by_overflowable_literal():
    """The arithmetic sibling of the HUGEINT lint: `col * L` with a large
    literal L silently diverges at scale — Spark wraps int64 while DuckDB
    promotes to HUGEINT (the feature_hash_cross class, closed in r07 by
    reducing the id mod 2^20 BEFORE its Knuth multiply). Flag any BARE
    column identifier multiplied by a literal >= 10^7 (a raw id can
    plausibly reach 2^40; 2^40 * 10^7 > 2^63): reduce the column
    (`(col % m) * L` — the paren breaks the match) or shrink the literal."""
    import re

    LIMIT = 10_000_000
    ident = r"[A-Za-z_]\w*"
    pat_cl = re.compile(rf"\b({ident})\s*\*\s*(\d+)")
    pat_lc = re.compile(rf"\b(\d+)\s*\*\s*({ident})\b")
    offenders = {}
    for name, sql in all_oracles().items():
        hits = []
        for col, lit in pat_cl.findall(sql):
            if int(lit) >= LIMIT:
                hits.append(f"{col} * {lit}")
        for lit, col in pat_lc.findall(sql):
            if int(lit) >= LIMIT:
                hits.append(f"{lit} * {col}")
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"oracles multiplying a raw column by an int64-overflowable "
        f"literal: {offenders} — reduce the column mod m first"
    )


def test_query_priority_names_are_registered_and_unique():
    from bharatmlstack_spark.queries import QUERY_PRIORITY, all_queries

    names = set(all_queries())
    unknown = [n for n in QUERY_PRIORITY if n not in names]
    assert not unknown, f"QUERY_PRIORITY entries not in the registry: {unknown}"
    assert len(QUERY_PRIORITY) == len(set(QUERY_PRIORITY)), "duplicate priority entries"
    # every registered query should hold an explicit priority slot — an
    # unlisted query silently sorts last and can fall out of rotation
    unlisted = sorted(names - set(QUERY_PRIORITY))
    assert not unlisted, f"registered queries missing from QUERY_PRIORITY: {unlisted}"
