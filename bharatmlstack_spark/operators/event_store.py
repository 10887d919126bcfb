"""EventStore: the interaction-store re-expressed over an events DataFrame.

The reference stores per-user time-series events (clicks/orders) in a
24-week ring of weekly columns across 3 bucket tables
(interaction-store/internal/constants/constants.go:5-24), merging new events
into the week list sorted desc by ts and trimming to 500
(internal/handler/persist/click.go:127-182), and serves time-range + limit
queries by walking weeks newest-to-oldest
(internal/handler/retrieve/click.go:63-263).

Spark re-expression: the ring + bucket-table layout is a storage artifact;
an ``events`` DataFrame partitioned by week gives the same semantics:
- week index  = ISO week-of-year % 24 (utils.go:148-151 + click.go:131)
- retention   = keep newest 500 per (user, week)      [A1/T2]
- retrieve    = filter range -> order desc ts -> limit [T1/P5/A5]
- validation  = end <= now, range <= 24 weeks, limit <= 2000 [P5/T4]
- clicks ∪ orders in one response                      [O2]

Scale note: retention/trim is one window over (user_id, week) — a single
shuffle on user_id; retrieval is a pruned scan (week/date partition) +
TakeOrderedAndProject, no full sort at 100 TB.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOTAL_WEEKS = 24  # constants.go:8-11
MAX_RETRIEVE_LIMIT = 2000  # constants.go:17-18
MAX_EVENTS_PER_WEEK = 500  # constants.go:20-24


def week_index(ts: Column) -> Column:
    """ISO week-of-year mod 24 — the reference's ring slot
    (utils.go:148-151; `% TotalWeeks` at persist/click.go:131)."""
    return F.weekofyear(ts) % TOTAL_WEEKS


def week_start(ts: Column) -> Column:
    """Absolute week bucket (tumbling 7-day window start) — what the ring
    slot *means* once storage isn't a 24-column Scylla row."""
    return F.date_trunc("week", ts)


class EventStore:
    """Batch API; the streaming twin reuses these inside foreachBatch
    (streaming/ingest.py)."""

    def __init__(
        self,
        user_col: str = "user_id",
        ts_col: str = "ts",
        max_per_week: int = MAX_EVENTS_PER_WEEK,
        tiebreak_cols: list[str] | None = None,
    ):
        self.user_col = user_col
        self.ts_col = ts_col
        self.max_per_week = max_per_week
        # equal-ts events: the reference keeps whatever order the Scylla
        # row held (persist/click.go:165-182 sorts by ts only); a
        # distributed window needs an explicit total order for the trim
        # to be deterministic across retries/partitionings
        self.tiebreak_cols = tiebreak_cols or []

    # -- persist path -------------------------------------------------

    def merge_trim(self, existing: DataFrame, new: DataFrame | None = None) -> DataFrame:
        """A1/T2: merge new events into stored state, keep the newest
        ``max_per_week`` per (user, week), newest-first within the week.

        One window over (user, week) — the distributed analog of
        mergeAndTrimEvents (persist/click.go:165-182): append + sort desc +
        truncate, applied per key in parallel instead of per request.
        """
        df = existing if new is None else existing.unionByName(new, allowMissingColumns=True)
        w = Window.partitionBy(
            self.user_col, week_start(F.col(self.ts_col))
        ).orderBy(F.desc(self.ts_col), *[F.desc(c) for c in self.tiebreak_cols])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.max_per_week)
            .drop("__rn")
        )

    def retention_filter(self, df: DataFrame, now: Column) -> DataFrame:
        """SS3: the 24-week rolling window as a predicate (the ring's
        overwrite-on-wrap becomes delete-older-than)."""
        return df.filter(
            F.col(self.ts_col) >= F.timestamp_seconds(
                F.unix_timestamp(now) - F.lit(TOTAL_WEEKS * 7 * 24 * 3600)
            )
        )

    # -- retrieve path ------------------------------------------------

    def validate_range(self, start: datetime, end: datetime, now: datetime) -> None:
        """P5: end must not be in the future; range positive and <= 24 weeks
        (retrieve/retrieve.go:22-36)."""
        if end > now:
            raise ValueError("end timestamp is in the future")
        if start > end:
            raise ValueError("start after end")
        if end - start > timedelta(weeks=TOTAL_WEEKS):
            raise ValueError(f"range exceeds {TOTAL_WEEKS} weeks")

    def retrieve(
        self,
        df: DataFrame,
        user_id,
        start: datetime,
        end: datetime,
        limit: int = MAX_RETRIEVE_LIMIT,
        now: datetime | None = None,
    ) -> DataFrame:
        """T1/P5/A5: per-user range query, newest first, capped limit.

        Catalyst compiles orderBy+limit to TakeOrderedAndProject (per-
        partition top-k + merge) — the same early-exit merge the reference
        hand-rolls over pre-sorted weeks (retrieve/click.go:239-263).
        """
        if now is not None:
            self.validate_range(start, end, now)
        capped = min(int(limit), MAX_RETRIEVE_LIMIT)  # T4, retrieve.go:38-43
        return (
            df.filter(F.col(self.user_col) == F.lit(user_id))
            .filter(F.col(self.ts_col).between(F.lit(start), F.lit(end)))
            .orderBy(F.desc(self.ts_col))
            .limit(capped)
        )

    def retrieve_batch(
        self,
        df: DataFrame,
        users_df: DataFrame,
        start: datetime,
        end: datetime,
        limit: int = MAX_RETRIEVE_LIMIT,
    ) -> DataFrame:
        """Batch variant: top-``limit`` newest per requested user in one
        plan (semi-join + window) instead of N point queries."""
        capped = min(int(limit), MAX_RETRIEVE_LIMIT)
        w = Window.partitionBy(self.user_col).orderBy(F.desc(self.ts_col))
        return (
            df.join(F.broadcast(users_df), on=self.user_col, how="left_semi")
            .filter(F.col(self.ts_col).between(F.lit(start), F.lit(end)))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= capped)
            .drop("__rn")
        )

    @staticmethod
    def union_interactions(clicks: DataFrame, orders: DataFrame) -> DataFrame:
        """O2: RetrieveInteractions returns clicks ∪ orders
        (time_series.proto:47-62)."""
        return clicks.unionByName(orders, allowMissingColumns=True)
