"""Point-in-time (as-of) join — training-data correctness for the feature
store.

The reference serves only the LATEST feature value (online lookup); an
offline engine additionally needs "the feature value as it was at label
time" to generate leakage-free training sets. Spark has no ASOF JOIN
operator; the standard scalable shape (used here) is the union + ordered
window forward-fill:

    tag(labels ∪ feature_history)
      -> window partitionBy(keys) orderBy(ts, is_label)
      -> last(feature, ignorenulls) over rows unboundedPreceding..current
      -> keep label rows

One shuffle on the entity key, no range-join row explosion, and the
equal-timestamp rule (feature at ts == label ts IS visible — inclusive
`<=`) falls out of ordering feature rows before label rows at ties, which
matches DuckDB/kdb ASOF semantics (the oracle uses DuckDB's native
ASOF LEFT JOIN).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    labels: DataFrame,
    features: DataFrame,
    on: list[str],
    label_ts: str,
    feature_ts: str,
    feature_cols: list[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For every label row, attach the newest feature row with
    ``feature_ts <= label_ts`` per key (NULLs when none exists).

    ``tolerance_ms``: optional max lookback — a feature older than
    ``label_ts - tolerance_ms`` is treated as absent (stale-feature guard).
    Staleness is judged PER COLUMN: each column forward-fills independently
    (``last(c, ignorenulls)``), so when the newest feature row has NULL in
    column ``c`` the served value comes from an older row — the guard must
    compare against the timestamp of the row that value actually came from,
    not the newest feature row overall. Timestamps are epoch-ms BIGINT.
    """
    lab = labels.withColumn("__ts", F.col(label_ts).cast("long")).withColumn(
        "__is_label", F.lit(1)
    )
    feat = features.select(
        *on,
        F.col(feature_ts).cast("long").alias("__ts"),
        *[F.col(c) for c in feature_cols],
    ).withColumn("__is_label", F.lit(0))

    merged = lab.unionByName(feat, allowMissingColumns=True)
    # feature rows sort BEFORE label rows at equal ts -> inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), F.asc("__is_label"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Fill value and its per-column source timestamp from the SAME original
    # column in one projection (chained withColumn would make the ts
    # expression see the already-filled value). All expressions share one
    # window spec -> a single shuffle+sort regardless of column count.
    exprs = []
    for c in feature_cols:
        val = F.last(c, ignorenulls=True).over(w)
        if tolerance_ms is not None:
            # __ts of the feature row this column's value actually came from
            ts_c = F.last(
                F.when((F.col("__is_label") == 0) & F.col(c).isNotNull(), F.col("__ts")),
                ignorenulls=True,
            ).over(w)
            val = F.when(ts_c >= F.col("__ts") - F.lit(int(tolerance_ms)), val)
        exprs.append(val.alias(c))
    others = [F.col(c) for c in merged.columns if c not in feature_cols]
    filled = merged.select(*others, *exprs)
    return (
        filled.filter(F.col("__is_label") == 1)
        .drop("__is_label", "__ts")
    )
