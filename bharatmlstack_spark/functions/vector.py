"""Vector math over ARRAY<FLOAT/DOUBLE> columns — all JVM-side expressions.

Re-expresses skye's scoring kernels (dot product at
skye/internal/serving/handlers/embedding/adapter.go:68, distance configs at
skye/README.md:17) with ``zip_with``/``aggregate`` so they stay inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Element-wise dot product of two equal-length array columns (F17).

    Elements are cast to DOUBLE before multiplying: a float32*float32
    product is exactly representable in float64, so the left fold is
    bit-identical to an explicit ``CAST(a[i] AS DOUBLE)*CAST(b[i] AS
    DOUBLE) + ...`` SQL chain — the property the ANN equality oracles
    rely on (a single-precision multiply would round each term first).
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot/(|a||b|) (F18). Zero-norm inputs yield NULL (0/0 guarded)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an embedding; zero vectors pass through unchanged."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n == 0, a).otherwise(F.transform(a, lambda x: x / n))
