"""Property-fuzz the RPN compiler (functions/expressions.py) against a
row-at-a-time Python reference evaluator.

The three registered RPN driver rows pin fixed expressions; this suite
generates arbitrary well-formed postfix trees and asserts the compiled
Catalyst column computes the same values — including the reference's error
semantics (NULL in non-strict mode) and Spark/Java numeric corners (NaN
ordering in comparisons, null-skipping least/greatest, Java Math.pow).

Error-path parity mirrors numerix's compile failures
(numerix/src/pkg/rust_matrix_frame/matrix.rs:130-201): unknown token,
stack underflow, and leftover stack items raise RPNCompileError for ANY
input, well-formed or not.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bharatmlstack_spark.functions.expressions import (
    RPNCompileError,
    rpn_to_column,
)

COLS = ("x", "y", "z")
NAN = float("nan")

# value pool: small ints for logic/comparisons, 0 for divide-by-zero,
# negatives for log domain errors, halves for pow fractions, a big value
# so exp/pow overflow to inf
VALUES = st.sampled_from(
    [-3.0, -2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0, 3.0, 800.0]
)


# -- reference evaluator: Spark/Java semantics, row at a time ---------------


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _java_pow(a: float, b: float) -> float:
    """java.lang.Math.pow corners where Python diverges."""
    if b == 0:
        return 1.0  # pow(anything, ±0) = 1, even NaN base
    if abs(a) == 1.0 and math.isinf(b):
        return NAN  # Java: |base|==1 with infinite exponent is NaN
    if _is_nan(a) or _is_nan(b):
        return NAN  # Java: NaN exponent is NaN even for base 1.0
    try:
        return math.pow(a, b)
    except OverflowError:
        neg = a < 0 and b == int(b) and int(b) % 2 == 1
        return float("-inf") if neg else float("inf")
    except ValueError:
        # CPython raises ValueError (not ZeroDivisionError) for
        # math.pow(±0, negative); Java returns ±inf by zero sign/parity
        if a == 0.0 and b < 0:
            neg = math.copysign(1.0, a) < 0 and b == int(b) and int(b) % 2 == 1
            return float("-inf") if neg else float("inf")
        return NAN  # negative base, fractional exponent
    except ZeroDivisionError:
        neg = math.copysign(1.0, a) < 0 and b == int(b) and int(b) % 2 == 1
        return float("-inf") if neg else float("inf")


def _cmp_key(v: float):
    """Spark ordering: NaN is greater than any non-NaN value."""
    return (1, 0.0) if _is_nan(v) else (0, v)


def _sql_and(a, b):
    """Three-valued AND over {True, False, None}."""
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _sql_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _logical_ref(a, b, is_and: bool):
    # domain guard: NULL-valued `bad` falls through to the three-valued value
    bad = _sql_or(
        None if a is None else (a != 0 and a != 1 and not _is_nan(a)) or _is_nan(a),
        None if b is None else (b != 0 and b != 1 and not _is_nan(b)) or _is_nan(b),
    )
    if bad is True:
        return None  # non-strict mode: error rows yield NULL
    ea = None if a is None else a == 1
    eb = None if b is None else b == 1
    val = _sql_and(ea, eb) if is_and else _sql_or(ea, eb)
    return None if val is None else float(val)


def _compare_ref(a, b, op: str):
    if a is None or b is None:
        return None
    ka, kb = _cmp_key(a), _cmp_key(b)
    return float(
        {"<": ka < kb, "<=": ka <= kb, ">": ka > kb, ">=": ka >= kb, "==": ka == kb}[op]
    )


def _binary_ref(tok: str, a, b):
    if tok in ("<", "<=", ">", ">=", "=="):
        return _compare_ref(a, b, tok)
    if tok in ("&", "|"):
        return _logical_ref(a, b, tok == "&")
    if tok in ("min", "max"):
        vals = [v for v in (a, b) if v is not None]  # least/greatest skip nulls
        if not vals:
            return None
        return (min if tok == "min" else max)(vals, key=_cmp_key)
    if tok == "/":
        if b == 0:  # guarded before the null check: x/0 is an error row
            return None
        if a is None or b is None:
            return None
        try:
            return a / b
        except ZeroDivisionError:  # b == -0.0 compares == 0, already handled
            return None
    if a is None or b is None:
        return None
    if tok == "+":
        return a + b
    if tok == "-":
        return a - b
    if tok == "*":
        return a * b
    if tok == "^":
        return _java_pow(a, b)
    raise AssertionError(tok)


def _unary_ref(tok: str, a):
    if tok == "log":
        if a is not None and not _is_nan(a) and a <= 0:
            return None  # domain error row
        if a is None:
            return None
        return math.log(a) if not _is_nan(a) else NAN
    if a is None:
        return None
    if tok == "abs":
        return abs(a)
    if tok == "exp":
        try:
            return math.exp(a)
        except OverflowError:
            return float("inf")
    raise AssertionError(tok)


def eval_rpn_ref(tokens: list[str], row: dict[str, float]):
    stack: list = []
    for tok in tokens:
        if tok in ("+", "-", "*", "/", "^", "<", "<=", ">", ">=", "==",
                   "min", "max", "&", "|"):
            b, a = stack.pop(), stack.pop()
            stack.append(_binary_ref(tok, a, b))
        elif tok in ("exp", "log", "abs"):
            stack.append(_unary_ref(tok, stack.pop()))
        elif tok in row:
            stack.append(row[tok])
        else:
            stack.append(float(tok))
    assert len(stack) == 1
    return stack[0]


# -- well-formed postfix generator ------------------------------------------

OPERAND = st.one_of(
    st.sampled_from(COLS),
    st.sampled_from(["0", "1", "2", "-1", "0.5", "3"]),
)

BINOPS = ["+", "-", "*", "/", "^", "<", "<=", ">", ">=", "==", "min", "max", "&", "|"]
UNOPS = ["exp", "log", "abs"]


def rpn_trees(depth: int = 3):
    return st.recursive(
        OPERAND.map(lambda t: [t]),
        lambda sub: st.one_of(
            st.tuples(sub, sub, st.sampled_from(BINOPS)).map(
                lambda t: t[0] + t[1] + [t[2]]
            ),
            st.tuples(sub, st.sampled_from(UNOPS)).map(lambda t: t[0] + [t[1]]),
        ),
        max_leaves=6,
    )


def _same(spark_val, ref_val) -> bool:
    if spark_val is None or ref_val is None:
        return spark_val is None and ref_val is None
    if _is_nan(spark_val) or _is_nan(ref_val):
        return _is_nan(spark_val) and _is_nan(ref_val)
    if math.isinf(spark_val) or math.isinf(ref_val):
        return spark_val == ref_val
    return math.isclose(spark_val, ref_val, rel_tol=1e-9, abs_tol=1e-12)


@settings(max_examples=20, deadline=None)
@given(
    tokens=rpn_trees(),
    rows=st.lists(
        st.tuples(VALUES, VALUES, VALUES), min_size=1, max_size=5
    ),
)
def test_rpn_compiles_to_reference_semantics(spark, tokens, rows):
    df = spark.createDataFrame(rows, list(COLS))
    col = rpn_to_column(" ".join(tokens), columns=set(COLS), strict=False)
    got = [r["out"] for r in df.select(col.alias("out")).collect()]
    want = [eval_rpn_ref(tokens, dict(zip(COLS, r))) for r in rows]
    assert len(got) == len(want)
    for g, w, r in zip(got, want, rows):
        assert _same(g, w), f"rpn={' '.join(tokens)!r} row={r}: spark={g!r} ref={w!r}"


# -- compiler never mis-raises: any token soup either compiles or raises
#    RPNCompileError (matrix.rs error enum: UnknownToken/StackUnderflow) ----

TOKEN_SOUP = st.lists(
    st.sampled_from(list(BINOPS) + UNOPS + list(COLS) + ["0", "2.5", "bogus", "LOG"]),
    min_size=0,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(tokens=TOKEN_SOUP)
def test_rpn_compile_total_over_token_soup(tokens):
    try:
        col = rpn_to_column(" ".join(tokens), columns=set(COLS))
    except RPNCompileError:
        return
    assert col is not None
    # a successful compile implies the stream was exactly balanced: replay
    # the stack discipline to confirm (1 item left, no underflow)
    depth = 0
    for tok in tokens:
        if tok in BINOPS:
            assert depth >= 2
            depth -= 1
        elif tok in UNOPS:
            assert depth >= 1
        else:
            assert tok != "bogus" and tok != "LOG"  # unknowns must not compile
            depth += 1
    assert depth == 1


# -- deterministic error-path parity ----------------------------------------


def test_unknown_token_raises():
    with pytest.raises(RPNCompileError, match="unknown token"):
        rpn_to_column("x nope +", columns={"x"})


def test_stack_underflow_binary():
    with pytest.raises(RPNCompileError, match="underflow"):
        rpn_to_column("x +", columns={"x"})


def test_stack_underflow_unary():
    with pytest.raises(RPNCompileError, match="underflow"):
        rpn_to_column("log", columns=set())


def test_leftover_stack_items():
    with pytest.raises(RPNCompileError, match="left on stack"):
        rpn_to_column("x y", columns={"x", "y"})


def test_empty_expression():
    with pytest.raises(RPNCompileError, match="empty"):
        rpn_to_column("", columns=set())


def test_strict_divide_by_zero_raises(spark):
    df = spark.createDataFrame([(1.0, 0.0)], ["a", "b"])
    col = rpn_to_column("a b /", columns={"a", "b"}, strict=True)
    with pytest.raises(Exception, match="divide by zero"):
        df.select(col).collect()


def test_strict_logical_domain_raises(spark):
    df = spark.createDataFrame([(2.0, 1.0)], ["a", "b"])
    col = rpn_to_column("a b &", columns={"a", "b"}, strict=True)
    with pytest.raises(Exception, match="logical operand"):
        df.select(col).collect()
