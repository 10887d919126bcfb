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


def test_defer_cleanup_runs_on_drain_and_swallows_errors():
    from bharatmlstack_spark.query_registry import defer_cleanup

    ran = []
    defer_cleanup(lambda: ran.append("a"))
    defer_cleanup(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    defer_cleanup(lambda: ran.append("b"))
    drain_pending_unpersist()  # runs all three; the raiser is swallowed
    assert sorted(ran) == ["a", "b"]
    # queue is drained; a second drain is a no-op
    drain_pending_unpersist()
    assert sorted(ran) == ["a", "b"]


def test_registered_query_entry_drains_prior_cleanups(spark, sf_dir):
    """Invoking any registered query releases the previous query's
    deferred resources — the lifecycle bucketed_colocated_join relies on
    to drop its catalog tables and tempdir."""
    from bharatmlstack_spark.queries import QUERIES
    from bharatmlstack_spark.query_registry import defer_cleanup

    ran = []
    defer_cleanup(lambda: ran.append("x"))
    QUERIES["topk_orders"](spark, sf_dir)  # any registered query
    assert ran == ["x"]
