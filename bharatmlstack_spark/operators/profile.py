"""Data-profiling + feature-discretization operators.

``profile_table`` is the ingest-time data-quality pass a training pipeline
runs before trusting a new drop of data: null rates, exact cardinalities,
numeric ranges — one scan, one aggregate row, exploded to a row per column.

``quantile_bin`` is feature discretization (equal-frequency binning) the
scale-safe way: ONE pass computes exact percentile boundaries, then bucket
assignment is a scan-level expression against the broadcast 9-element
boundary array — no global sort, no single-partition ntile window. At
100 TB the boundary aggregate is a partial-agg tree and assignment stays
embarrassingly parallel; swap ``F.percentile`` for
``percentile_approx`` when exactness can yield to memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: nulls, exact distinct count, numeric min/max.

    Single aggregate pass over the input (Catalyst fuses all the agg
    expressions into one physical aggregate); the per-column explode runs
    on the 1-row result. min/max are typed DOUBLE and NULL for
    non-numeric columns — counts stay exact BIGINT for any type.
    """
    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    # unpivot the 1-row aggregate with ONE stack generator: a unionAll of
    # per-column selects would re-execute the whole scan+aggregate once
    # per column (plan branches don't share the un-materialized subtree)
    # column names reach raw SQL: backtick-quote references and escape the
    # string literal, so names with spaces/quotes profile like any other
    def _ref(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    parts = []
    for c in cols:
        lit = "'" + c.replace("'", "''") + "'"
        mn = _ref(f"__mn_{c}") if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = _ref(f"__mx_{c}") if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"{lit}, CAST({_ref(f'__nn_{c}')} AS BIGINT), "
            f"CAST({_ref(f'__nd_{c}')} AS BIGINT), {mn}, {mx}"
        )
    stack = (
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(column_name, n_nulls, n_distinct, vmin, vmax)"
    )
    return row.selectExpr(stack)


def quantile_bin(
    df: DataFrame, value_col: str, n_buckets: int = 10, keep: list[str] | None = None
) -> DataFrame:
    """Equal-frequency binning: bucket i holds values in (q_{i-1}, q_i].

    boundaries = exact linear-interpolation percentiles (reference
    percentile semantics — numerix fp32_ops.rs:334-348); assignment =
    1 + |{b in boundaries : x > b}| via a JVM array filter on the
    broadcast boundary row. Deterministic given the data multiset —
    no ordering or partitioning dependence (unlike ntile).
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs])).alias("__bs")
    )
    out_cols = (keep or [c for c in df.columns if c != value_col]) + [value_col]
    joined = df.select(*out_cols).crossJoin(F.broadcast(bounds))
    bucket = (
        F.size(F.filter(F.col("__bs"), lambda b: F.col(value_col) > b)) + 1
    ).alias("bucket")
    return joined.select(*out_cols, bucket)


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_num: int,
    threshold_den: int,
    top_per_partition: int = 4096,
) -> DataFrame:
    """Frequent items above a frequency fraction (threshold_num /
    threshold_den of all rows), the two-pass way that scales:

    - **Pass 1 (candidates)**: each partition emits only its
      ``top_per_partition`` most frequent values (one Arrow-batched
      pandas value_counts per partition) — a bounded
      partitions x k candidate set, NEVER the full-cardinality
      groupBy shuffle that a direct exact count would pay.
    - **Pass 2 (exact)**: candidates broadcast back onto the scan; only
      their counts aggregate exactly, then the threshold filter applies.

    Output (value, cnt) is EXACT for every emitted row — approximation
    can only appear as a MISSED candidate, which requires a value above
    the global threshold yet below every partition's local top-k: with
    k=4096 and any realistic threshold (>=0.1%) that needs adversarial
    placement across thousands of partitions. At 100 TB this is 2 scans
    + a candidate-sized shuffle vs one full-vocabulary shuffle
    (`ngram_topk` is the full-shuffle form; this is the sketch-family
    sibling of the HLL/KLL rows)."""
    from bharatmlstack_spark.query_registry import defer_unpersist

    vals = defer_unpersist(df.select(F.col(col).alias("__v")).persist())
    n_total = vals.agg(F.count(F.lit(1)).cast("long").alias("__n"))

    def part_candidates(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            vc = pdf["__v"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
        if acc is None or acc.empty:
            yield pd.DataFrame({"__v": pd.Series([], dtype=object)})
            return
        top = acc.sort_values(ascending=False, kind="stable").head(
            top_per_partition
        )
        yield pd.DataFrame({"__v": top.index})

    # candidate schema mirrors the input column's type — a hardcoded
    # string would break the Arrow conversion for numeric columns (or,
    # coerced, push an implicit lossy cast into the join back)
    cand_schema = f"__v {df.schema[col].dataType.simpleString()}"
    cands = vals.mapInPandas(part_candidates, cand_schema).distinct()
    return (
        vals.join(F.broadcast(cands), on="__v")
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * threshold_den >= threshold_num * F.col("__n"))
        .select(F.col("__v").alias("value"), "cnt")
    )
