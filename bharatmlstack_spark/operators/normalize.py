"""Window normalizations (W1-W3) with exact reference edge-case parity.

numerix's "normalizations" are whole-column kernels over the request matrix
(numerix/src/pkg/rust_matrix_frame/ops/fp32_ops.rs:239-348). Here the
"column" is a DataFrame column and the "request matrix" is a window
partition (whole frame when ``partition_by`` is empty).

Pinned semantics (fp32_ops.rs):
- norm_min_max (:239-247 + calculate_min_max_norm :319-333):
    (x - min) / (max - min); constant column (delta == 0) -> all 1.0.
    NOT clipped.
- percentile_rank (:280-304): POSITIONAL — element i gets i/(n-1) assuming
  value-sorted order; constant column -> all 1.0. (n==1 falls out as
  0/0 -> the constant branch yields 1.0.) We realize "position" as
  row_number ordered by (value, tiebreak...) so results are deterministic
  under ties.
- norm_percentile_p_q (:249-277): p == q -> error; n == 1 -> 1.0;
  lo = percentile_cont(p/100), hi = percentile_cont(q/100) over the sorted
  column (compute_percentile :334-348 is exactly linear interpolation);
  lo == hi -> min-max-norm with (min,max)=(1,2), i.e. x - 1.0;
  lo > hi -> swap; else (x - lo)/(hi - lo). NOT clipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: list[str] | None) -> WindowSpec:
    return Window.partitionBy(*(partition_by or []))


def norm_min_max(
    df: DataFrame,
    col: str,
    output: str = "norm",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W1: (x-min)/(max-min), constant partition -> 1.0."""
    w = _window(partition_by)
    mn, mx = F.min(col).over(w), F.max(col).over(w)
    x = F.col(col)
    return df.withColumn(
        output,
        F.when(mx - mn == 0, F.lit(1.0)).otherwise((x - mn) / (mx - mn)),
    )


def percentile_rank(
    df: DataFrame,
    col: str,
    output: str = "rank",
    partition_by: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W2: positional rank i/(n-1) in value order; constant -> 1.0."""
    parts = partition_by or []
    order = [F.col(col).asc()] + [F.col(t).asc() for t in (tiebreak or [])]
    w_ord = Window.partitionBy(*parts).orderBy(*order)
    w_all = _window(partition_by)
    n = F.count(F.lit(1)).over(w_all)
    is_const = F.min(col).over(w_all) == F.max(col).over(w_all)
    pos = F.row_number().over(w_ord) - 1
    return df.withColumn(
        output,
        F.when(is_const, F.lit(1.0)).otherwise(
            pos.cast("double") / (n - 1).cast("double")
        ),
    )


def norm_percentile(
    df: DataFrame,
    col: str,
    p: float,
    q: float,
    output: str = "norm",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W3: normalize by [p,q] percentiles (0-100 scale), reference edges.

    norm_percentile_0_99 == (p,q)=(0,99); norm_percentile_5_95 == (5,95)
    (fp32_ops.rs:305-317).
    """
    if p == q:
        raise ValueError("norm_percentile: p == q (PEqualsQDivByZero)")
    w = _window(partition_by)
    n = F.count(F.lit(1)).over(w)
    lo0 = F.percentile(F.col(col), F.lit(p / 100.0)).over(w)
    hi0 = F.percentile(F.col(col), F.lit(q / 100.0)).over(w)
    # lo > hi -> swap (possible when p > q)
    lo = F.least(lo0, hi0)
    hi = F.greatest(lo0, hi0)
    x = F.col(col)
    return df.withColumn(
        output,
        F.when(n == 1, F.lit(1.0))
        .when(lo0 == hi0, x - F.lit(1.0))  # (min,max)=(1,2) branch
        .otherwise((x - lo) / (hi - lo)),
    )
