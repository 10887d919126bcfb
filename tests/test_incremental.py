"""Incremental materialization invariant: incremental(delta) == full
rebuild, for touched AND untouched keys, and replay is idempotent."""

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.feature_store import FeatureStore
from bharatmlstack_spark.operators.incremental import affected_keys, incremental_materialize
from bharatmlstack_spark.registry import DataType, Entity, Feature, FeatureGroup, SchemaRegistry


def _registry() -> SchemaRegistry:
    reg = SchemaRegistry()
    reg.register(
        Entity(
            "buyer",
            ["user_id"],
            {
                "orders": FeatureGroup(
                    "orders",
                    1,
                    DataType.INT64,
                    {
                        1: [
                            Feature("n_orders", 0, default=0),
                            Feature("spend_cents", 1, default=0),
                        ]
                    },
                )
            },
        )
    )
    return reg


def _compute(fact):
    return fact.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.count(F.lit(1)).alias("orders__n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "orders__spend_cents"
        ),
    )


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _state(fs):
    return {
        r.user_id: (r.orders__n_orders, r.orders__spend_cents)
        for r in fs.load("buyer").collect()
    }


def test_incremental_equals_full_rebuild(spark, tmp_path, orders):
    fact_t0 = orders.filter(F.col("o_orderkey") % 3 != 0)
    delta = orders.filter(F.col("o_orderkey") % 3 == 0)

    fs = FeatureStore(spark, _registry(), str(tmp_path / "inc"))
    fs.materialize("buyer", _compute(fact_t0))  # initial full build

    n = incremental_materialize(
        fs, "buyer", orders, delta, ["o_custkey"], _compute
    )
    assert n == affected_keys(delta, ["o_custkey"]).count()

    got = _state(fs)
    want = {
        r.user_id: (r.orders__n_orders, r.orders__spend_cents)
        for r in _compute(orders).collect()
    }
    # every materialized key — touched or not — matches the full rebuild
    assert got == want


def test_incremental_replay_is_idempotent(spark, tmp_path, orders):
    delta = orders.filter(F.col("o_orderkey") % 3 == 0)
    fs = FeatureStore(spark, _registry(), str(tmp_path / "inc2"))
    fs.materialize("buyer", _compute(orders.filter(F.col("o_orderkey") % 3 != 0)))

    incremental_materialize(fs, "buyer", orders, delta, ["o_custkey"], _compute)
    first = _state(fs)
    # at-least-once delivery: the same delta arrives again
    incremental_materialize(fs, "buyer", orders, delta, ["o_custkey"], _compute)
    assert _state(fs) == first


def test_cdc_apply_three_paths(spark):
    """upsert / delete / insert / untouched — all four outcomes on one
    crafted batch, latest-sequence-wins within the batch."""
    from bharatmlstack_spark.operators.incremental import cdc_apply

    snap = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "user_id long, bal long"
    )
    changes = spark.createDataFrame(
        [
            (1, 10, "U", 111),   # plain update
            (2, 11, "U", 999),   # superseded by ...
            (2, 12, "D", 0),     # ... a later delete
            (4, 13, "U", 444),   # insert (not in snapshot)
            (4, 9, "D", 0),      # stale delete, loses to seq 13
        ],
        "user_id long, seq long, op string, bal long",
    )
    out = {
        r.user_id: (r.bal, r.src)
        for r in cdc_apply(snap, changes, ["user_id"], "seq").collect()
    }
    assert out == {
        1: (111, "cdc"),
        3: (300, "snapshot"),
        4: (444, "cdc"),
    }


def test_cdc_apply_bulk_mode_matches_broadcast_mode(spark):
    """broadcast_changes=False (the bulk-backlog / compliance-replay path)
    must produce identical results to the default broadcast mode, and the
    two plans must differ exactly in the body join's build strategy:
    broadcast -> BroadcastHashJoin on the snapshot LEFT JOIN; bulk -> a
    shuffled join (SortMergeJoin / ShuffledHashJoin) chosen by AQE."""
    from bharatmlstack_spark.operators.incremental import cdc_apply

    snap = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 200)], "user_id long, bal long"
    )
    changes = spark.createDataFrame(
        [(i, i, "U", i * 100) for i in range(150, 250)]
        + [(i, 1000 + i, "D", 0) for i in range(1, 20)],
        "user_id long, seq long, op string, bal long",
    )

    fast = cdc_apply(snap, changes, ["user_id"], "seq")
    bulk = cdc_apply(snap, changes, ["user_id"], "seq", broadcast_changes=False)
    a = {(r.user_id, r.bal, r.src) for r in fast.collect()}
    b = {(r.user_id, r.bal, r.src) for r in bulk.collect()}
    assert a == b and len(a) == 199 - 19 + 50  # 199 snap - 19 deleted + 50 inserts

    fast_plan = fast._jdf.queryExecution().executedPlan().toString()
    bulk_plan = bulk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in fast_plan
    # bulk mode: no broadcast hint on the change batch — the body join may
    # still END UP broadcast via AQE size estimation on this tiny fixture,
    # but the HINT must be gone from the analyzed plan
    assert "broadcast" not in bulk._jdf.queryExecution().analyzed().toString().lower()


def test_cdc_apply_seq_tie_is_deterministic(spark):
    """Two changes sharing (key, seq) — an out-of-contract feed — resolve
    by the documented tiebreak (desc op, then desc payload), identically
    across partitionings."""
    from bharatmlstack_spark.operators.incremental import cdc_apply

    snap = spark.createDataFrame([(1, 100)], "user_id long, bal long")
    changes = [(1, 5, "U", 111), (1, 5, "U", 333), (1, 5, "D", 0)]
    outs = set()
    for n_parts in (1, 3):
        ch = spark.createDataFrame(
            changes, "user_id long, seq long, op string, bal long"
        ).repartition(n_parts)
        rows = cdc_apply(snap, ch, ["user_id"], "seq").collect()
        outs.add(tuple(sorted((r.user_id, r.bal, r.src) for r in rows)))
    # op desc: 'U' > 'D', then payload desc: 333 > 111 -> the 333 update wins
    assert outs == {((1, 333, "cdc"),)}
