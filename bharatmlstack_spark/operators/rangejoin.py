"""Range (interval) join — points vs intervals without the O(n·m) blowup.

Spark compiles a plain `p.ts BETWEEN i.start AND i.end` join (plus any
equi-keys) to a nested-loop / broadcast-nested-loop — fine for small
interval sets, fatal at fact scale. The scalable shape is BUCKETIZATION:
slice time into fixed-width buckets, explode each interval to the buckets
it overlaps, bucket each point, equi-join on (keys…, bucket), then apply
the exact range predicate. The equi-join carries all the pruning; the
final filter is exact, so results are identical to the naive join
(asserted in tests + the DuckDB oracle, which uses the naive form).

Bucket width tunes shuffle fan-out: ~median interval length is the sweet
spot (each interval explodes to ~2 buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width: int = 3600_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point (epoch-ms ``point_ts``) to every interval
    [start_col, end_col] (inclusive) it falls into, optionally also
    matching equi-keys ``on``. ``how`` supports inner/left (left keeps
    pointless points with NULL interval columns)."""
    on = on or []
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__bucket", (F.col(point_ts) / bucket_width).cast("long"))
    joined = pts.join(ivals, on=on + ["__bucket"], how="inner").filter(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    if how == "inner":
        return joined.drop("__bucket")
    if how == "left":
        matched = joined.drop("__bucket")
        # NULL-SAFE anti-join: plain `on=columns` equality never matches a
        # NULL cell, so a matched point carrying a NULL column would also
        # re-emerge here as a spurious unmatched row
        p, m = points.alias("__p"), (
            matched.select(*points.columns).dropDuplicates(points.columns).alias("__m")
        )
        cond = None
        for c in points.columns:
            eq = F.col(f"__p.{c}").eqNullSafe(F.col(f"__m.{c}"))
            cond = eq if cond is None else cond & eq
        missing = p.join(m, on=cond, how="left_anti")
        for c in intervals.columns:
            if c not in missing.columns:
                missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r} (inner|left)")
