"""W1-W3 edge cases pinned to fp32_ops.rs:239-348."""

import pytest

from bharatmlstack_spark.operators.normalize import (
    norm_min_max,
    norm_percentile,
    percentile_rank,
)


def _vals(df, col, order="id"):
    return [r[col] for r in df.orderBy(order).collect()]


@pytest.fixture(scope="module")
def simple(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, 50.0)], ["id", "x"]
    )


@pytest.fixture(scope="module")
def constant(spark):
    return spark.createDataFrame([(1, 7.0), (2, 7.0), (3, 7.0)], ["id", "x"])


def test_norm_min_max_basic(simple):
    out = _vals(norm_min_max(simple, "x"), "norm")
    assert out == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_norm_min_max_constant_is_one(constant):
    """delta == 0 -> all 1.0 (calculate_min_max_norm fp32_ops.rs:319-333)."""
    assert _vals(norm_min_max(constant, "x"), "norm") == [1.0, 1.0, 1.0]


def test_percentile_rank_positional(simple):
    """i/(n-1) in value order (fp32_ops.rs:280-304)."""
    out = _vals(percentile_rank(simple, "x", tiebreak=["id"]), "rank")
    assert out == [0.0, 0.25, 0.5, 0.75, 1.0]


def test_percentile_rank_constant_is_one(constant):
    assert _vals(percentile_rank(constant, "x", tiebreak=["id"]), "rank") == [1.0] * 3


def test_percentile_rank_single_row(spark):
    df = spark.createDataFrame([(1, 42.0)], ["id", "x"])
    assert _vals(percentile_rank(df, "x", tiebreak=["id"]), "rank") == [1.0]


def test_norm_percentile_p_eq_q_raises(simple):
    with pytest.raises(ValueError):
        norm_percentile(simple, "x", 50.0, 50.0)


def test_norm_percentile_single_row(spark):
    """n == 1 -> [1.0] (fp32_ops.rs:260-262)."""
    df = spark.createDataFrame([(1, 99.0)], ["id", "x"])
    out = _vals(norm_percentile(df, "x", 0.0, 99.0), "norm")
    assert out == [1.0]


def test_norm_percentile_constant_column(constant):
    """lo == hi -> min-max-norm with (1,2), i.e. x - 1.0 (fp32_ops.rs:
    266-268)."""
    out = _vals(norm_percentile(constant, "x", 5.0, 95.0), "norm")
    assert out == [6.0, 6.0, 6.0]  # 7.0 - 1.0


def test_norm_percentile_basic(simple):
    """(x - p5)/(p95 - p5) with linear-interpolated percentiles
    (compute_percentile fp32_ops.rs:334-348)."""
    # sorted [10..50], p5 = 10 + 0.2*10 = 12, p95 = 40 + 0.8*10 = 48
    out = _vals(norm_percentile(simple, "x", 5.0, 95.0), "norm")
    assert out == pytest.approx([(v - 12.0) / 36.0 for v in [10, 20, 30, 40, 50]])


def test_norm_percentile_swapped_bounds(simple):
    """p > q swaps lo/hi instead of erroring (fp32_ops.rs:269-276)."""
    a = _vals(norm_percentile(simple, "x", 95.0, 5.0), "norm")
    b = _vals(norm_percentile(simple, "x", 5.0, 95.0), "norm")
    assert a == pytest.approx(b)


def test_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 10.0), (3, "b", 5.0), (4, "b", 5.0)],
        ["id", "g", "x"],
    )
    out = _vals(norm_min_max(df, "x", partition_by=["g"]), "norm")
    assert out == [0.0, 1.0, 1.0, 1.0]  # group b constant -> 1.0
