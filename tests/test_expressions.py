"""RPN compiler (F1-F8) — semantics + error paths pinned to
numerix/src/pkg/rust_matrix_frame (matrix.rs:130-201, fp32_ops.rs:19-237,
tests at tests/matrix_fp32_test.rs)."""

import math

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.functions.expressions import (
    ExpressionEngine,
    RPNCompileError,
    rpn_to_column,
)


@pytest.fixture(scope="module")
def mat(spark):
    return spark.createDataFrame(
        [(1, 2.0, 3.0, 0.0, 1.0), (2, 10.0, 4.0, 2.0, 0.0)],
        ["id", "a", "b", "z", "flag"],
    )


def _vals(df, col="out"):
    return [r[col] for r in df.orderBy("id").collect()]


def test_arithmetic(mat):
    out = mat.withColumn("out", rpn_to_column("a b +", {"a", "b", "z", "flag"}))
    assert _vals(out) == [5.0, 14.0]
    out = mat.withColumn("out", rpn_to_column("a b * 2 -", {"a", "b"}))
    assert _vals(out) == [4.0, 38.0]


def test_power_and_unary(mat):
    out = mat.withColumn("out", rpn_to_column("a 2 ^", {"a"}))
    assert _vals(out) == [4.0, 100.0]
    out = mat.withColumn("out", rpn_to_column("b a - abs", {"a", "b"}))
    assert _vals(out) == [1.0, 6.0]
    out = mat.withColumn("out", rpn_to_column("a exp log", {"a"}))
    assert _vals(out) == pytest.approx([2.0, 10.0])


def test_comparisons_return_floats(mat):
    out = mat.withColumn("out", rpn_to_column("a b >", {"a", "b"}))
    assert _vals(out) == [0.0, 1.0]
    out = mat.withColumn("out", rpn_to_column("a b <=", {"a", "b"}))
    assert _vals(out) == [1.0, 0.0]
    out = mat.withColumn("out", rpn_to_column("a 2 ==", {"a"}))
    assert _vals(out) == [1.0, 0.0]


def test_min_max_binary(mat):
    out = mat.withColumn("out", rpn_to_column("a b min", {"a", "b"}))
    assert _vals(out) == [2.0, 4.0]
    out = mat.withColumn("out", rpn_to_column("a b max", {"a", "b"}))
    assert _vals(out) == [3.0, 10.0]


def test_boolean_ops(mat):
    out = mat.withColumn("out", rpn_to_column("flag 1 &", {"flag"}))
    assert _vals(out) == [1.0, 0.0]
    out = mat.withColumn("out", rpn_to_column("flag 0 |", {"flag"}))
    assert _vals(out) == [1.0, 0.0]


def test_named_literals(mat):
    """F7: literal metadata broadcast (handler.rs:369-397)."""
    out = mat.withColumn(
        "out", rpn_to_column("a weight *", {"a"}, literals={"weight": 0.5})
    )
    assert _vals(out) == [1.0, 5.0]


def test_divide_by_zero_errors(mat):
    """fp32_ops.rs:58-76 + matrix_fp32_test.rs test_divide_vectors_error."""
    from py4j.protocol import Py4JJavaError

    out = mat.withColumn("out", rpn_to_column("a z /", {"a", "z"}, strict=True))
    with pytest.raises(Exception):
        out.collect()
    # non-strict: NULL instead
    out = mat.withColumn("out", rpn_to_column("a z /", {"a", "z"}, strict=False))
    vals = _vals(out)
    assert vals[0] is None and vals[1] == 5.0


def test_log_domain_error(mat):
    out = mat.withColumn("out", rpn_to_column("z log", {"z"}, strict=False))
    vals = _vals(out)
    assert vals[0] is None  # log(0) -> error -> null in non-strict
    assert vals[1] == pytest.approx(math.log(2.0))


def test_boolean_domain_error(mat):
    """& with non-0/1 operand errors (fp32_ops.rs:165-206)."""
    out = mat.withColumn("out", rpn_to_column("a flag &", {"a", "flag"}, strict=False))
    vals = _vals(out)
    assert vals == [None, None]  # a is 2.0/10.0, both out of domain


def test_compile_errors():
    with pytest.raises(RPNCompileError):
        rpn_to_column("a +", {"a"})  # underflow
    with pytest.raises(RPNCompileError):
        rpn_to_column("a b", {"a", "b"})  # extra stack items
    with pytest.raises(RPNCompileError):
        rpn_to_column("a unknown_tok +", {"a"})  # unknown token
    with pytest.raises(RPNCompileError):
        rpn_to_column("", {"a"})  # empty


def test_engine_registry(mat):
    eng = ExpressionEngine()
    eng.register("ctr_boost", "a b * k +", literals={"k": 1.0}, output_column="score")
    out = eng.apply(mat, "ctr_boost")
    assert [r["score"] for r in out.orderBy("id").collect()] == [7.0, 41.0]


def test_fp32_compute_mode(mat, spark):
    """dtype='float' mimics numerix's f32 kernels: intermediates round to
    float32 (fp32_ops.rs), diverging from the fp64 twin where f32 can't
    represent the exact value."""
    df = spark.createDataFrame([(1, 0.1, 0.2)], ["id", "x", "y"])
    f32 = df.withColumn("out", rpn_to_column("x y +", {"x", "y"}, dtype="float"))
    f64 = df.withColumn("out", rpn_to_column("x y +", {"x", "y"}, dtype="double"))
    import numpy as np

    v32 = f32.collect()[0]["out"]
    v64 = f64.collect()[0]["out"]
    assert v32 == np.float32(np.float32(0.1) + np.float32(0.2))
    assert v64 == 0.1 + 0.2
    assert abs(v32 - v64) > 0  # the widths genuinely differ
