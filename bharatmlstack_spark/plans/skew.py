"""Skew mitigation: salted joins.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime; salting is the declarative fallback for the cases AQE can't fix —
e.g. a hot key on the BUILD side of an aggregation-after-join, or engines
with AQE off. Standard technique: replicate the small side SALT times,
scatter the big side's hot keys across salt buckets, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple["F.Column", str]],
    salt: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot/low-cardinality keys.

    Stage 1 groups by ``keys + __salt`` computing PARTIAL aggregates (the
    hot key's rows spread over ``salt`` reducers); stage 2 merges the
    ``salt``-bounded partials by ``keys`` alone. Row-identical to
    ``df.groupBy(keys).agg(...)`` for the mergeable kinds supported:

    ``aggs``: out_name -> (column expression, kind), kind in
    {"count", "sum", "min", "max"}. ``count`` counts non-null values of the
    expression (merge = sum of partial counts).

    ``salt_source`` names a column whose hash scatters rows; defaults to a
    per-row monotonic id (non-deterministic assignment, deterministic
    result — the merge is associative+commutative). The reference shards
    hot entities across consumer workers the same way
    (online-feature-store/internal/consumer/listeners/kafka.go:80-95).
    """
    kinds = {"count", "sum", "min", "max"}
    for name, (_, kind) in aggs.items():
        if kind not in kinds:
            raise ValueError(f"unsupported agg kind {kind!r} for {name!r}")
    scatter = (
        F.xxhash64(F.col(salt_source))
        if salt_source is not None
        else F.xxhash64(F.monotonically_increasing_id())
    )
    salted = df.withColumn("__salt", F.pmod(scatter, F.lit(salt)))
    partial_fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    partials = salted.groupBy(*keys, "__salt").agg(
        *[
            partial_fns[kind](expr).alias(f"__p_{name}")
            for name, (expr, kind) in aggs.items()
        ]
    )
    merge_fns = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    merged = partials.groupBy(*keys).agg(
        *[
            merge_fns[kind](F.col(f"__p_{name}")).alias(name)
            for name, (_, kind) in aggs.items()
        ]
    )
    return merged


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed key distribution in ``big``.

    ``big`` rows get a random-but-deterministic salt (hash of the full row's
    key + a uniform spread via monotonically varying pmod), ``small`` rows
    are replicated once per salt value; the join key becomes (on, salt) so
    one hot key spreads over ``salt`` reducers. Result is row-identical to
    ``big.join(small, on, how)``.
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(salt))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_small = small.select("*", salts).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    out = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")
