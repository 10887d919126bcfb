"""Direct tests for the query-registry plumbing: the deferred-unpersist
contract and registration invariants."""

from pyspark.sql import functions as F

from bharatmlstack_spark.query_registry import (
    ORACLES,
    QUERIES,
    defer_unpersist,
    drain_pending_unpersist,
)


def test_defer_unpersist_releases_on_drain(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2).persist()
    df.count()
    assert df.storageLevel.useMemory  # persisted now
    out = defer_unpersist(df)
    assert out is df  # passthrough, usable as the persisted frame
    assert df.storageLevel.useMemory  # still cached until the NEXT query
    drain_pending_unpersist()
    assert not df.storageLevel.useMemory  # released
    # drain is idempotent and safe on an empty queue
    drain_pending_unpersist()


def test_registry_oracle_keys_are_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
    # every registered query is callable
    assert all(callable(f) for f in QUERIES.values())


def test_drain_survives_already_unpersisted_frames(spark):
    df = spark.range(5).persist()
    df.count()
    defer_unpersist(df)
    df.unpersist()  # someone released it early
    drain_pending_unpersist()  # must not raise
