"""Pair / slate expansion (J5) — PairWise and SlateWise request shapes.

The reference's PairWise requests carry index pairs into the target list and
SlateWise requests carry slates of target indices
(inferflow/server/proto/predict.proto:84-97,116-133); the predator
component expands them against the target matrix
(predator_component.go:175-191).

Spark shape: ``posexplode`` the index arrays and join back to the exploded
target rows on (request, position) — a positional self-join, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _targets_by_pos(requests: DataFrame, request_col: str, targets_col: str) -> DataFrame:
    return requests.select(
        request_col, F.posexplode(targets_col).alias("__pos", "__target")
    )


def expand_pairs(
    requests: DataFrame,
    request_col: str = "request_id",
    targets_col: str = "target_ids",
    pairs_col: str = "pairs",
) -> DataFrame:
    """PairWise: each pair {first, second} of indices into ``targets_col``
    becomes a row with both resolved targets.

    Output: (request, pair_idx, first_idx, second_idx, first_target,
    second_target).
    """
    pos = _targets_by_pos(requests, request_col, targets_col)
    pairs = requests.select(
        request_col, F.posexplode(pairs_col).alias("pair_idx", "__pair")
    ).select(
        request_col,
        "pair_idx",
        F.col("__pair.first").alias("first_idx"),
        F.col("__pair.second").alias("second_idx"),
    )
    a = pos.withColumnRenamed("__pos", "first_idx").withColumnRenamed(
        "__target", "first_target"
    )
    b = pos.withColumnRenamed("__pos", "second_idx").withColumnRenamed(
        "__target", "second_target"
    )
    return pairs.join(a, on=[request_col, "first_idx"]).join(
        b, on=[request_col, "second_idx"]
    ).select(
        request_col, "pair_idx", "first_idx", "second_idx", "first_target", "second_target"
    )


def expand_slates(
    requests: DataFrame,
    request_col: str = "request_id",
    targets_col: str = "target_ids",
    slates_col: str = "slates",
) -> DataFrame:
    """SlateWise: each slate (array of target indices) expands to resolved
    targets, preserving slate order, and re-assembles per slate.

    Output: (request, slate_idx, slate_targets ARRAY) — the reference's
    slate matrix rows (predict.proto:116-133).
    """
    pos = _targets_by_pos(requests, request_col, targets_col)
    slate_items = (
        requests.select(
            request_col, F.posexplode(slates_col).alias("slate_idx", "__slate")
        )
        .select(
            request_col,
            "slate_idx",
            F.posexplode("__slate").alias("item_pos", "__pos"),
        )
    )
    resolved = slate_items.join(pos, on=[request_col, "__pos"])
    return (
        resolved.groupBy(request_col, "slate_idx")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("item_pos", "__target"))
            ).alias("__items")
        )
        .select(
            request_col,
            "slate_idx",
            F.col("__items.__target").alias("slate_targets"),
        )
    )
