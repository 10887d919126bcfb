"""Point-in-time join semantics: inclusive <=, per-key isolation, staleness
tolerance."""

import pytest

from bharatmlstack_spark.operators.asof import as_of_join


@pytest.fixture(scope="module")
def frames(spark):
    labels = spark.createDataFrame(
        [(1, 1, 1000), (2, 1, 2000), (3, 1, 500), (4, 2, 1500)],
        ["label_id", "k", "ts"],
    )
    feats = spark.createDataFrame(
        [(1, 900, 9.0), (1, 2000, 20.0), (2, 100, 1.0)],
        ["k", "fts", "v"],
    )
    return labels, feats


def _vals(df):
    return {r["label_id"]: r["v"] for r in df.collect()}


def test_asof_basic(frames):
    labels, feats = frames
    out = as_of_join(labels, feats, on=["k"], label_ts="ts", feature_ts="fts", feature_cols=["v"])
    got = _vals(out)
    assert got[1] == 9.0  # newest feature <= 1000 is ts 900
    assert got[2] == 20.0  # equal timestamp IS visible (inclusive <=)
    assert got[3] is None  # no feature before ts 500
    assert got[4] == 1.0  # key isolation: k=2 sees only its own history


def test_asof_tolerance(frames):
    labels, feats = frames
    out = as_of_join(
        labels, feats, on=["k"], label_ts="ts", feature_ts="fts",
        feature_cols=["v"], tolerance_ms=200,
    )
    got = _vals(out)
    assert got[1] == 9.0  # 1000 - 900 = 100 <= 200: fresh
    assert got[2] == 20.0  # same-ts: age 0
    assert got[4] is None  # 1500 - 100 = 1400 > 200: stale -> absent


def test_asof_multiple_feature_columns(spark):
    labels = spark.createDataFrame([(1, 1, 100)], ["label_id", "k", "ts"])
    feats = spark.createDataFrame([(1, 50, 1.0, "x")], ["k", "fts", "a", "b"])
    out = as_of_join(
        labels, feats, on=["k"], label_ts="ts", feature_ts="fts", feature_cols=["a", "b"]
    ).collect()[0]
    assert out["a"] == 1.0 and out["b"] == "x"


def test_asof_preserves_label_count(frames):
    labels, feats = frames
    out = as_of_join(labels, feats, on=["k"], label_ts="ts", feature_ts="fts", feature_cols=["v"])
    assert out.count() == labels.count()
