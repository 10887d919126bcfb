"""Numerix re-expressed: RPN expression -> native Spark Column.

The reference evaluates whitespace-tokenized postfix expressions over a
column-major f32/f64 matrix with a Rust stack machine
(numerix/src/pkg/rust_matrix_frame/matrix.rs:130-201; element-wise ops at
fp32_ops.rs:19-237). Here the same token stream *compiles to a Catalyst
expression tree* — evaluation is Tungsten-vectorized JVM code, the Spark
analog of numerix's SIMD kernels, with zero Python in the loop.

Token table (matrix.rs:29-78):
  arithmetic   + - * / ^
  comparison   > < >= <= ==     (produce 1.0 / 0.0)
  binary       min max
  boolean      & |              (operands must be exactly 0 or 1)
  unary        exp log abs
  operands     column names, numeric literals, named literals (compute
               metadata, handler.rs:369-397)

Error semantics (strict mode, matching the reference which fails the whole
request — handler.rs:267-293, error enum src/pkg/rust_matrix_frame/error.rs):
  /   with a zero divisor        -> DivideByZero
  log with operand <= 0          -> LogError
  & | with operand not in {0,1}  -> LogicalOpError
  unknown token / stack underflow / extra stack items -> compile error
With ``strict=False`` the error rows yield NULL instead of failing the job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RPNCompileError(ValueError):
    """Unknown token, stack underflow, or leftover stack items."""


def _err(cond: Column, message: str, value: Column, strict: bool) -> Column:
    """Guard ``value`` with reference error semantics."""
    if strict:
        return F.when(cond, F.raise_error(F.lit(message))).otherwise(value)
    return F.when(cond, F.lit(None).cast("double")).otherwise(value)


def _logical(a: Column, b: Column, is_and: bool, strict: bool) -> Column:
    """& and | require operands to be exactly 0 or 1 (fp32_ops.rs:165-206).

    The domain check guards the WHOLE result (not each operand) so that
    non-strict mode yields NULL even when three-valued logic would
    short-circuit (NULL AND FALSE is FALSE in SQL, but the reference errors
    the request)."""
    bad = (a != 0) & (a != 1) | (b != 0) & (b != 1)
    val = ((a == 1) & (b == 1)) if is_and else ((a == 1) | (b == 1))
    return _err(bad, "numerix: logical operand not 0/1", val.cast("double"), strict)


_BINARY = {
    "+": lambda a, b, s: a + b,
    "-": lambda a, b, s: a - b,
    "*": lambda a, b, s: a * b,
    "/": lambda a, b, s: _err(b == 0, "numerix: divide by zero", a / b, s),
    "^": lambda a, b, s: F.pow(a, b),
    ">": lambda a, b, s: (a > b).cast("double"),
    "<": lambda a, b, s: (a < b).cast("double"),
    ">=": lambda a, b, s: (a >= b).cast("double"),
    "<=": lambda a, b, s: (a <= b).cast("double"),
    "==": lambda a, b, s: (a == b).cast("double"),
    "min": lambda a, b, s: F.least(a, b),
    "max": lambda a, b, s: F.greatest(a, b),
    "&": lambda a, b, s: _logical(a, b, True, s),
    "|": lambda a, b, s: _logical(a, b, False, s),
}

_UNARY = {
    "exp": lambda a, s: F.exp(a),
    "log": lambda a, s: _err(a <= 0, "numerix: log of non-positive", F.log(a), s),
    "abs": lambda a, s: F.abs(a),
}


def _is_number(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


def rpn_to_column(
    rpn: str,
    columns: set[str] | None = None,
    literals: dict[str, float] | None = None,
    strict: bool = True,
    dtype: str = "double",
) -> Column:
    """Compile a whitespace-tokenized postfix expression to one Column.

    ``columns`` restricts which tokens resolve as column references (when
    None, any non-operator non-numeric token is treated as a column).
    ``literals`` are the named constants carried in compute metadata (F7).
    ``dtype`` selects the arithmetic width: 'double' is the fp64 twin
    (numerix fp64_ops.rs), 'float' mimics the f32 kernels exactly — every
    operand and intermediate result rounds to float32 (fp32_ops.rs), so
    accumulated rounding matches a matrix declared DataTypeFP32.
    """
    literals = literals or {}
    stack: list[Column] = []
    tokens = rpn.split()
    if not tokens:
        raise RPNCompileError("empty expression")

    def w(col: Column) -> Column:  # round intermediates to the compute width
        return col.cast(dtype)

    for tok in tokens:
        if tok in _BINARY:
            if len(stack) < 2:
                raise RPNCompileError(f"stack underflow at operator {tok!r}")
            b, a = stack.pop(), stack.pop()
            stack.append(w(_BINARY[tok](a, b, strict)))
        elif tok in _UNARY:
            if len(stack) < 1:
                raise RPNCompileError(f"stack underflow at operator {tok!r}")
            stack.append(w(_UNARY[tok](stack.pop(), strict)))
        elif tok in literals:
            stack.append(F.lit(float(literals[tok])).cast(dtype))
        elif _is_number(tok):
            stack.append(F.lit(float(tok)).cast(dtype))
        elif columns is None or tok in columns:
            stack.append(F.col(tok).cast(dtype))
        else:
            raise RPNCompileError(f"unknown token {tok!r}")
    if len(stack) != 1:
        raise RPNCompileError(f"{len(stack)} items left on stack (want exactly 1)")
    return stack[0]


@dataclass
class ComputeConfig:
    """A registered named expression (numerix compute-id, U1)."""

    compute_id: str
    rpn: str
    literals: dict[str, float] = field(default_factory=dict)
    output_column: str = "score"


class ExpressionEngine:
    """Named-expression registry, the analog of numerix's etcd-registered
    compute configs (numerix/src/handler/config.rs; request carries a
    compute_id, handler.rs:71)."""

    def __init__(self) -> None:
        self._configs: dict[str, ComputeConfig] = {}

    def register(
        self,
        compute_id: str,
        rpn: str,
        literals: dict[str, float] | None = None,
        output_column: str = "score",
    ) -> ComputeConfig:
        cfg = ComputeConfig(compute_id, rpn, dict(literals or {}), output_column)
        self._configs[compute_id] = cfg
        return cfg

    def column(self, compute_id: str, columns: set[str] | None = None, strict: bool = True) -> Column:
        cfg = self._configs[compute_id]
        return rpn_to_column(cfg.rpn, columns, cfg.literals, strict)

    def apply(self, df: DataFrame, compute_id: str, strict: bool = True) -> DataFrame:
        """Evaluate the expression over the score matrix (DataFrame), adding
        the output column — the `Numerix.Compute` call as a plan node."""
        cfg = self._configs[compute_id]
        return df.withColumn(cfg.output_column, self.column(compute_id, set(df.columns), strict))
