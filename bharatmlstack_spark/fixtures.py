"""Deterministic derived fixtures (FIXTURES.md) with DuckDB SQL twins.

Each builder has a Spark implementation and a byte-for-byte-equivalent SQL
CTE string so the same derived table can be materialized inside oracle
queries. All derivations use exact integer arithmetic (hash-free, trig-free)
so Spark and DuckDB produce identical values.

Fixture 1 (`user_features`) mirrors the ONFS sample entity
(online-feature-store/examples/sample-data/persist-sample.json — entity
`user`, key [user_id]) over the `customer` table. TTL expiry uses fixed
timestamps (past/future) against a fixed NOW so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bharatmlstack_spark.registry import DataType, Entity, Feature, FeatureGroup, SchemaRegistry

# fixed "now" for TTL comparisons — deterministic across engines
FIXED_NOW = "2026-01-01 00:00:00"
PAST_TS = "2020-01-01 00:00:00"
FUTURE_TS = "2030-01-01 00:00:00"

# Knuth multiplicative constant. The taste-vector mix reduces the key
# mod 2^20 BEFORE multiplying (max product 2^23 * 2654435761 < 2^55):
# the raw key*(8*_MULT) would exceed int64 for keys >= ~4.3e8, where
# Spark wraps silently but DuckDB promotes to HUGEINT (the divergence
# class tests/test_oracle_types.py lints). Identical values for keys
# < 2^20 — every driver fixture id.
_MULT = 2654435761


def user_registry() -> SchemaRegistry:
    """Registry for the `user` entity (FIXTURES.md §1 FG layout)."""
    reg = SchemaRegistry()
    reg.register(
        Entity(
            label="user",
            key_columns=["user_id"],
            feature_groups={
                "demo_int32": FeatureGroup(
                    "demo_int32", 1, DataType.INT32,
                    {1: [Feature("age", 0, default=0)]},
                ),
                "demo_fp": FeatureGroup(
                    "demo_fp", 2, DataType.FP32,
                    {1: [Feature("acct_bal", 0, default=0.0)]},
                ),
                "demo_str": FeatureGroup(
                    "demo_str", 3, DataType.STRING,
                    {1: [
                        Feature("location", 0, default="NA", string_length=16),
                        Feature("subscription_type", 1, default="none", string_length=16),
                    ]},
                ),
                "demo_bool": FeatureGroup(
                    "demo_bool", 4, DataType.BOOL,
                    {1: [Feature("is_active", 0, default=False)]},
                ),
                "demo_vec": FeatureGroup(
                    "demo_vec", 5, DataType.FP32_VECTOR,
                    {1: [Feature("taste_vec", 0, default=0.0, vector_length=8)]},
                ),
            },
        )
    )
    return reg


def user_tags_registry() -> SchemaRegistry:
    """Registry variant with a STRING_VECTOR feature group — the reference's
    DataTypeStringVector (data_type.go:39), Pascal-encoded string vectors in
    PSDB v2 blocks (perm_storage_datablock_v2.go:576-626): fixed vector
    length, per-element booked string length, error (not truncate) on
    overflow. Tag-lists are the canonical feature of this shape."""
    reg = SchemaRegistry()
    reg.register(
        Entity(
            label="user",
            key_columns=["user_id"],
            feature_groups={
                "demo_tags": FeatureGroup(
                    "demo_tags", 6, DataType.STRING_VECTOR,
                    {1: [
                        Feature(
                            "tags", 0, default="none",
                            string_length=12, vector_length=3,
                        ),
                    ]},
                ),
            },
        )
    )
    return reg


def user_tag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-vector fixture: deterministic 3-tag lists from customer
    (segment / seg<k%5> / nat<nationkey>), same TTL pattern as fixture 1
    so both engines agree on expiry."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    tags = F.array(
        F.col("c_mktsegment"),
        F.concat(F.lit("seg"), (k % 5).cast("string")),
        F.concat(F.lit("nat"), F.col("c_nationkey").cast("string")),
    )
    return c.select(
        k.alias("user_id"),
        tags.alias("demo_tags__tags"),
        F.lit(1).alias("schema_version"),
        F.when(k % 10 == 0, F.lit(PAST_TS)).otherwise(F.lit(FUTURE_TS))
        .cast("timestamp").alias("expires_at"),
    )


USER_TAG_FEATURES_CTE = f"""user_tag_features AS (
  SELECT
    c_custkey AS user_id,
    [c_mktsegment,
     'seg' || CAST(c_custkey % 5 AS VARCHAR),
     'nat' || CAST(c_nationkey AS VARCHAR)] AS demo_tags__tags,
    1 AS schema_version,
    CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '{PAST_TS}' ELSE TIMESTAMP '{FUTURE_TS}' END AS expires_at
  FROM customer
)"""


def user_narrow_registry() -> SchemaRegistry:
    """Registry variant declaring the float FGs at NARROW storage widths —
    demo_fp as FP16 (SMALLINT bit patterns on disk) and demo_vec as
    FP8E5M2Vector (TINYINT codes on disk). Values read back are exactly the
    fp16 / E5M2 round-trips of what was persisted (F9; ref
    perm_storage_datablock_v2.go:365-392)."""
    reg = SchemaRegistry()
    reg.register(
        Entity(
            label="user",
            key_columns=["user_id"],
            feature_groups={
                "demo_fp": FeatureGroup(
                    "demo_fp", 2, DataType.FP16,
                    {1: [Feature("acct_bal", 0, default=0.0)]},
                ),
                "demo_vec": FeatureGroup(
                    "demo_vec", 5, DataType.FP8E5M2_VECTOR,
                    {1: [Feature("taste_vec", 0, default=0.0, vector_length=8)]},
                ),
            },
        )
    )
    return reg


def user_multistore_registry() -> SchemaRegistry:
    """Registry variant routing demo_int32 to store 0 and demo_fp to store 1
    (S3 multi-store abstraction / J2 scatter-gather; models.go:52 StoreId)."""
    reg = SchemaRegistry()
    reg.register(
        Entity(
            label="user",
            key_columns=["user_id"],
            feature_groups={
                "demo_int32": FeatureGroup(
                    "demo_int32", 1, DataType.INT32,
                    {1: [Feature("age", 0, default=0)]}, store_id=0,
                ),
                "demo_fp": FeatureGroup(
                    "demo_fp", 2, DataType.FP32,
                    {1: [Feature("acct_bal", 0, default=0.0)]}, store_id=1,
                ),
            },
        )
    )
    return reg


def candidate_registry() -> SchemaRegistry:
    """skye-shaped `candidate` entity: a 64-dim embedding group plus a
    payload group (brand string / price fp32) — the column layout the
    embedding-store aggregator merges sparsely
    (skye/internal/consumers/handler/aggregator/models.go:3-8)."""
    reg = SchemaRegistry()
    reg.register(
        Entity(
            label="candidate",
            key_columns=["candidate_id"],
            feature_groups={
                "emb": FeatureGroup(
                    "emb", 1, DataType.FP32_VECTOR,
                    {1: [Feature("vector", 0, vector_length=64)]},
                ),
                "payload": FeatureGroup(
                    "payload", 2, DataType.STRING,
                    {1: [Feature("brand", 0, default="?", string_length=16)]},
                ),
                "payload_fp": FeatureGroup(
                    "payload_fp", 3, DataType.FP32,
                    {1: [Feature("price", 0, default=0.0)]},
                ),
            },
        )
    )
    return reg


def user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of fixture 1: derived deterministically from customer."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    taste = F.array(*[
        ((((k % 1048576) * F.lit(i + 1)) * F.lit(_MULT)) % 1000).cast("double") / 1000.0
        for i in range(8)
    ]).cast("array<float>")
    return c.select(
        k.alias("user_id"),
        F.col("c_nationkey").cast("bigint").alias("nation_key"),
        (F.lit(20) + (k % 60)).cast("int").alias("demo_int32__age"),
        F.col("c_acctbal").cast("float").alias("demo_fp__acct_bal"),
        F.col("c_mktsegment").alias("demo_str__location"),
        F.when(k % 2 == 0, F.lit("premium")).otherwise(F.lit("basic")).alias(
            "demo_str__subscription_type"
        ),
        (F.col("c_acctbal") > 0).alias("demo_bool__is_active"),
        taste.alias("demo_vec__taste_vec"),
        F.lit(1).alias("schema_version"),
        F.when(k % 10 == 0, F.lit(PAST_TS)).otherwise(F.lit(FUTURE_TS))
        .cast("timestamp").alias("expires_at"),
    )


USER_FEATURES_CTE = f"""user_features AS (
  SELECT
    c_custkey AS user_id,
    CAST(c_nationkey AS BIGINT) AS nation_key,
    CAST(20 + (c_custkey % 60) AS INTEGER) AS demo_int32__age,
    CAST(c_acctbal AS FLOAT) AS demo_fp__acct_bal,
    c_mktsegment AS demo_str__location,
    CASE WHEN c_custkey % 2 = 0 THEN 'premium' ELSE 'basic' END AS demo_str__subscription_type,
    c_acctbal > 0 AS demo_bool__is_active,
    [CAST(CAST((((c_custkey % 1048576) * i) * {_MULT}) % 1000 AS DOUBLE) / 1000.0 AS FLOAT) FOR i IN [1,2,3,4,5,6,7,8]] AS demo_vec__taste_vec,
    1 AS schema_version,
    CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '{PAST_TS}' ELSE TIMESTAMP '{FUTURE_TS}' END AS expires_at
  FROM customer
)"""


def request_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Request key set: hits (every 5th customer), guaranteed misses
    (key+90000000), and duplicates (every 35th twice) — exercises P3
    default fill and A6 dedup/fan-out."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    hits = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("user_id")
    )
    misses = c.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 90000000).alias("user_id")
    )
    dups = c.filter(F.col("c_custkey") % 35 == 0).select(
        F.col("c_custkey").alias("user_id")
    )
    return hits.unionAll(misses).unionAll(dups)


REQUEST_KEYS_CTE = """request_keys AS (
  SELECT c_custkey AS user_id FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 90000000 AS user_id FROM customer WHERE c_custkey % 50 = 0
  UNION ALL
  SELECT c_custkey AS user_id FROM customer WHERE c_custkey % 35 = 0
)"""

LIVE_FEATURES_CTE = (
    f"live AS (SELECT * FROM user_features WHERE expires_at > TIMESTAMP '{FIXED_NOW}')"
)
