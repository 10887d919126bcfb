"""Partition-aware table writers — the storage layout half of the scale
story.

At 100 TB the difference between a usable and an unusable table is the
write layout: partition columns that match the dominant predicates
(partition pruning), file sizes that match maxPartitionBytes, and bucketing
on join keys so co-located joins skip the shuffle entirely.

Conventions for this engine's tables:
- feature tables: partitioned by a key-hash bucket column (point lookups
  prune to one bucket-file group; the composite PK stays intact in-row)
- event tables:   partitioned by week (the dominant predicate is a time
  range — partition pruning serves the 24-week window for free)
- embedding tables: bucketed by candidate id for join-free scoring
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.event_store import week_start


def write_feature_table(
    df: DataFrame, path: str, key_cols: list[str], n_buckets: int = 64
) -> None:
    """Hash-bucketed layout: `key_bucket = xxhash64(keys) % n` partition
    column. A point/batch retrieve computes the same bucket for its keys and
    prunes to matching directories (the parquet analog of Scylla's
    token-range routing, scylla.go:80-167)."""
    from bharatmlstack_spark.operators.feature_store import write_table_meta

    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))
    (
        df.withColumn("key_bucket", bucket)
        .repartition("key_bucket")
        .write.mode("overwrite")
        .partitionBy("key_bucket")
        .parquet(path)
    )
    # stamp the bucket modulus so a FeatureStore opened with a different
    # n_buckets adopts the table's layout instead of mis-hashing keys
    write_table_meta(df.sparkSession, path, n_buckets)


def read_feature_table_for_keys(spark, path: str, keys_df: DataFrame, key_cols: list[str], n_buckets: int = 64) -> DataFrame:
    """Prune the bucketed table to only the buckets the request keys hash
    into (collected driver-side — the request is small by definition).

    Targeted-path read: one driver-side listStatus of the root, then read
    ONLY the wanted ``key_bucket=`` dirs (basePath keeps the partition
    column). Reading the root and filtering ``isin(wanted)`` would list
    every bucket dir before pruning — O(n_buckets) file discovery per
    lookup, the hot-path cost the near-dup experiment measured
    (hadoop_list_partition_dirs docstring)."""
    from bharatmlstack_spark.operators.feature_store import (
        hadoop_list_partition_dirs,
    )

    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))
    wanted = [r[0] for r in keys_df.select(bucket.alias("b")).distinct().collect()]
    existing = hadoop_list_partition_dirs(spark, path, "key_bucket")
    if not existing:
        # no key_bucket= partition dirs at all: a flat table that stores
        # key_bucket as a data column (externally written or hand-migrated).
        # Fall back to the isin-filter read — correct rows instead of a
        # silently-empty frame (the filter still prunes via row-group stats).
        flat = spark.read.parquet(path)
        if "key_bucket" not in flat.columns:
            # not a feature-table layout at all (write_feature_table always
            # produces partition dirs or, post-migration, the data column) —
            # raise a targeted error instead of an unrelated
            # AnalysisException from the filter below
            raise ValueError(
                f"feature table {path} has neither key_bucket= partition "
                "dirs nor a key_bucket data column — not a layout "
                "write_feature_table produces; cannot prune a keyed read"
            )
        return flat.filter(F.col("key_bucket").isin(wanted))
    paths = [existing[b] for b in wanted if b in existing]
    if not paths:
        # partitioned table, but none of the wanted buckets exist yet:
        # preserve the schema, return no rows
        return spark.read.parquet(path).limit(0)
    return spark.read.option("basePath", path).parquet(*paths)


def write_event_table(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Week-partitioned layout: the 24-week retention and every time-range
    retrieve become partition pruning (SS3; interaction-store's
    bucket-table-per-8-weeks made declarative)."""
    (
        df.withColumn("week", F.date_format(week_start(F.col(ts_col)), "yyyy-MM-dd"))
        .repartition("week")
        .write.mode("overwrite")
        .partitionBy("week")
        .parquet(path)
    )


def write_zstd(df: DataFrame, path: str, **options) -> None:
    """Plain write with ZSTD (the reference compresses PSDB blocks
    opportunistically — internal/compression/zstd.go; parquet's codec is
    the columnar equivalent and is on by default in session.py)."""
    df.write.mode("overwrite").option("compression", "zstd").parquet(path, **options)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_rows_per_file: int,
) -> dict:
    """Small-file compaction — the maintenance pass every long-lived
    100 TB table needs: streaming sinks and per-bucket upserts leave
    thousands of KB-sized files whose open/footer cost eventually
    dominates scans. One read -> round-robin repartition to
    ceil(n / target_rows_per_file) -> one write; row count is preserved
    by construction and the output file count is deterministic (each
    round-robin partition is non-empty when n >= k). Returns
    {files_before, files_after, n_rows}. On a real cluster run this per
    partition directory so the job parallelizes across partitions and a
    failure invalidates one directory, not the table."""
    import math

    df = spark.read.parquet(src)
    n = df.count()
    files_before = df.select(F.input_file_name()).distinct().count()
    k = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(k).write.mode("overwrite").parquet(dst)
    out = spark.read.parquet(dst)
    return {
        "files_before": files_before,
        "files_after": out.select(F.input_file_name()).distinct().count(),
        "n_rows": out.count(),
    }
