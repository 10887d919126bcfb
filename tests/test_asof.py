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


def test_asof_tolerance_per_column(spark):
    """ADVICE r1: staleness must be judged per column. The newest feature
    row (in tolerance) has NULL in `a`, so `a` forward-fills from an older
    row that is OUTSIDE tolerance -> `a` must be absent while `b` (carried
    by the fresh row) survives."""
    labels = spark.createDataFrame([(1, 1, 1000)], ["label_id", "k", "ts"])
    feats = spark.createDataFrame(
        [(1, 100, 7.0, "old"), (1, 950, None, "new")],
        "k long, fts long, a double, b string",
    )
    out = as_of_join(
        labels, feats, on=["k"], label_ts="ts", feature_ts="fts",
        feature_cols=["a", "b"], tolerance_ms=200,
    ).collect()[0]
    assert out["a"] is None  # value came from ts=100, age 900 > 200
    assert out["b"] == "new"  # value came from ts=950, age 50 <= 200


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


# -- range join -------------------------------------------------------------


def test_range_join_matches_naive(spark):
    from pyspark.sql import functions as F

    from bharatmlstack_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 5000), (3, 2, 100), (4, 1, 99)], ["pid", "k", "ts"]
    )
    ivals = spark.createDataFrame(
        [(10, 1, 100, 200), (11, 1, 4000, 6000), (12, 2, 0, 50)],
        ["iid", "k", "s", "e"],
    )
    fast = range_join(pts, ivals, "ts", "s", "e", on=["k"], bucket_width=100)
    naive = pts.join(ivals, on="k").filter(F.col("ts").between(F.col("s"), F.col("e")))
    fkeys = sorted((r["pid"], r["iid"]) for r in fast.collect())
    nkeys = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert fkeys == nkeys == [(1, 10), (2, 11)]


def test_range_join_left(spark):
    from bharatmlstack_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 1, 100), (2, 1, 999999)], ["pid", "k", "ts"])
    ivals = spark.createDataFrame([(10, 1, 50, 150)], ["iid", "k", "s", "e"])
    out = range_join(pts, ivals, "ts", "s", "e", on=["k"], bucket_width=100, how="left")
    got = {r["pid"]: r["iid"] for r in out.collect()}
    assert got == {1: 10, 2: None}


def test_range_join_left_null_point_column(spark):
    """Regression: a matched point carrying a NULL column must not also
    re-emerge as a spurious unmatched row (the anti-join is null-safe)."""
    from bharatmlstack_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 100, None), (2, 5000, "x")], "pid long, ts long, tag string"
    )
    iv = spark.createDataFrame([(10, 50, 150)], "iid long, s long, e long")
    out = range_join(
        pts, iv, point_ts="ts", start_col="s", end_col="e",
        on=[], bucket_width=1000, how="left",
    ).collect()
    assert len(out) == 2
    by_pid = {r["pid"]: r for r in out}
    assert by_pid[1]["iid"] == 10 and by_pid[1]["tag"] is None
    assert by_pid[2]["iid"] is None
