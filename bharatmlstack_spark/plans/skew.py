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
