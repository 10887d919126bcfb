"""Incremental feature materialization — recompute only the entities a
new fact delta touches, then upsert.

The offline half of the reference's write path at pipeline scale: a full
re-materialization of a 100 TB fact table on every batch is the thing
that kills a feature platform; the correct unit of recomputation is the
*entity key*, because feature values are per-key aggregates.

    delta (today's orders)            — small
      -> affected keys (distinct)     — small
      -> fact semi-join affected      — prunes the 100 TB scan to the
                                        touched keys (partition/bucket
                                        layout makes this a real prune,
                                        writers.write_feature_table)
      -> compute_fn (same aggregation as the full build)
      -> FeatureStore.persist upsert  — latest-wins MERGE

Correctness invariant (pinned by tests/test_incremental.py): incremental
materialize over any delta == full re-materialize from scratch, because
compute_fn re-aggregates the affected keys' ENTIRE history, not just the
delta — no read-modify-write drift, idempotent under replay (exactly the
property foreachBatch needs for at-least-once streaming ingest).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.feature_store import FeatureStore


def affected_keys(delta: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct entity keys the delta touches."""
    return delta.select(*key_cols).dropDuplicates(key_cols)


def incremental_materialize(
    fs: FeatureStore,
    entity_label: str,
    fact_df: DataFrame,
    delta_df: DataFrame,
    key_cols: list[str],
    compute_fn: Callable[[DataFrame], DataFrame],
    store_id: int = 0,
) -> int:
    """Recompute features for the keys in ``delta_df`` only, from the full
    ``fact_df`` history of those keys, and upsert. Returns the number of
    entity rows refreshed.

    ``compute_fn``: the SAME aggregation used for the full build — it
    receives the pruned fact slice and must emit PK + feature columns.
    """
    keys = affected_keys(delta_df, key_cols)
    pruned = fact_df.join(F.broadcast(keys), on=key_cols, how="left_semi")
    refreshed = compute_fn(pruned)
    fs.persist(entity_label, refreshed, store_id=store_id)
    return refreshed.count()


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC batch (Debezium-style insert/update/delete stream) to a
    snapshot: per key, the HIGHEST-sequence change wins; a winning delete
    drops the key, a winning upsert replaces the row's payload columns,
    keys without changes keep their snapshot row, and upserts for unseen
    keys insert. Shape: the natural formulation is one FULL OUTER join,
    but Spark cannot broadcast either side of a full outer — the whole
    snapshot would shuffle. Instead: (a) snapshot LEFT JOIN
    broadcast(latest) handles update/delete/keep with ZERO snapshot
    shuffle (the change batch is broadcast-sized by definition of a CDC
    micro-batch), and (b) inserts come from a keys-only left-anti join —
    the snapshot side of that exchange carries just the key columns,
    bytes-per-row instead of full rows. Payload = every non-key,
    non-seq, non-op column of ``changes`` (must exist in ``snapshot``
    too).

    ``broadcast_changes=False`` is the bulk-backlog mode (an initial
    load or compliance replay of 10^8 changes stops being
    broadcastable): the broadcast hint is dropped and AQE picks a
    shuffled join — same results, same two-join split, the snapshot
    pays one key shuffle instead of a driver OOM. Mirrors
    FeatureStore.delete(broadcast_keys=False).

    Within one batch, ties on (key, seq) break deterministically by
    descending op then descending ORDERABLE payload values (map-typed
    payload columns are skipped — Spark cannot sort them, and including
    one would reject batches that have no ties at all) — but a real CDC
    sequence (Debezium LSN/offset, ref kafka.go:49-120 consumer
    ordering) is unique per key; the tiebreak exists so an
    out-of-contract feed still yields a partition-order-independent
    winner rather than a silently nondeterministic one."""
    from pyspark.sql.types import MapType

    payload = [
        c for c in changes.columns if c not in (*key_cols, seq_col, op_col)
    ]
    orderable = [
        c for c in payload
        if not isinstance(changes.schema[c].dataType, MapType)
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.desc(op_col), *[F.desc(c) for c in orderable]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", seq_col)
    )
    # hint only the body join's build side: in the inserts anti-join
    # `latest` is the LEFT (streamed) side, where a broadcast hint is
    # unusable for left_anti and would just be ignored with a warning
    lat_hinted = F.broadcast(latest) if broadcast_changes else latest

    body = snapshot.join(lat_hinted, on=key_cols, how="left").filter(
        F.col(op_col).isNull() | (F.col(op_col) != F.lit(delete_op))
    )
    cols = [F.col(k) for k in key_cols]
    for c in payload:
        # snapshot and change batch share payload names: change wins
        cols.append(
            F.when(F.col(op_col).isNotNull(), latest[c])
            .otherwise(snapshot[c])
            .alias(c)
        )
    cols.append(
        F.when(F.col(op_col).isNull(), F.lit("snapshot"))
        .otherwise(F.lit("cdc"))
        .alias("src")
    )
    inserts = latest.filter(F.col(op_col) != F.lit(delete_op)).join(
        snapshot.select(*key_cols), on=key_cols, how="left_anti"
    )
    return body.select(*cols).unionByName(
        inserts.select(
            *[F.col(k) for k in key_cols],
            *[F.col(c) for c in payload],
            F.lit("cdc").alias("src"),
        )
    )
