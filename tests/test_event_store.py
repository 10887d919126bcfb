"""EventStore semantics (A1/T1/T2/P5/A5/W5/O2) pinned to interaction-store."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.event_store import (
    MAX_RETRIEVE_LIMIT,
    EventStore,
    week_index,
)


def _dt(*args):
    return datetime(*args, tzinfo=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def store():
    return EventStore(user_col="user_id", ts_col="ts", max_per_week=3)


@pytest.fixture(scope="module")
def small(spark):
    rows = []
    base = datetime(2024, 1, 1)
    for i in range(10):  # 10 events, same user, same week
        rows.append((1, base.replace(hour=i), f"e{i}"))
    rows.append((2, base, "other"))
    rows.append((1, datetime(2024, 3, 1), "later-week"))
    return spark.createDataFrame(rows, ["user_id", "ts", "name"])


def test_merge_trim_caps_per_user_week(store, small):
    """persist/click.go:165-182: newest max_per_week survive."""
    out = store.merge_trim(small)
    mine = out.filter(F.col("user_id") == 1).collect()
    january = [r for r in mine if r["ts"].month == 1]
    assert len(january) == 3
    assert sorted(r["ts"].hour for r in january) == [7, 8, 9]  # newest 3
    assert any(r["ts"].month == 3 for r in mine)  # other week untouched


def test_merge_trim_with_new_batch(store, small, spark):
    new = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 23), "newest")], ["user_id", "ts", "name"]
    )
    out = store.merge_trim(small, new)
    jan = out.filter((F.col("user_id") == 1) & (F.month("ts") == 1)).collect()
    assert len(jan) == 3
    assert any(r["name"] == "newest" for r in jan)


def test_validate_range_rejects_future_end(store):
    """retrieve/retrieve.go:22-36."""
    now = _dt(2024, 6, 1)
    with pytest.raises(ValueError, match="future"):
        store.validate_range(_dt(2024, 5, 1), _dt(2024, 7, 1), now)


def test_validate_range_rejects_over_24_weeks(store):
    now = _dt(2024, 12, 1)
    with pytest.raises(ValueError, match="24 weeks"):
        store.validate_range(_dt(2024, 1, 1), _dt(2024, 11, 30), now)


def test_validate_range_rejects_inverted(store):
    now = _dt(2024, 6, 1)
    with pytest.raises(ValueError, match="start after end"):
        store.validate_range(_dt(2024, 5, 2), _dt(2024, 5, 1), now)


def test_retrieve_desc_and_limit(store, small):
    out = store.retrieve(
        small,
        1,
        _dt(2024, 1, 1),
        _dt(2024, 1, 2),
        limit=4,
        now=_dt(2024, 6, 1),
    ).collect()
    assert len(out) == 4
    hours = [r["ts"].hour for r in out]
    assert hours == sorted(hours, reverse=True)  # newest first


def test_retrieve_limit_capped_at_2000(store, small):
    """T4: server caps client limit (retrieve.go:38-43)."""
    out = store.retrieve(small, 1, _dt(2024, 1, 1), _dt(2024, 1, 2), limit=999999)
    # plan must embed 2000, not 999999 — count is tiny anyway
    assert out.count() <= MAX_RETRIEVE_LIMIT


def test_union_interactions(spark):
    clicks = spark.createDataFrame([(1, "c")], ["user_id", "catalog"])
    orders = spark.createDataFrame([(1, "o", "sub1")], ["user_id", "catalog", "sub_order"])
    out = EventStore.union_interactions(clicks, orders)
    assert out.count() == 2
    assert "sub_order" in out.columns  # allowMissingColumns


def test_week_index_matches_iso(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 4),), (datetime(2024, 12, 30),)], ["ts"]
    )
    out = df.select(week_index(F.col("ts")).alias("w")).collect()
    assert out[0]["w"] == 1  # ISO week 1
    assert out[1]["w"] == 1  # 2024-12-30 is ISO week 1 of 2025 -> 1 % 24


def test_sessionize_matches_native_session_window(spark, sf_dir):
    """Our lag+cumsum sessionization (events_sessionize query) and Spark's
    native session_window agree on session COUNT per user (30-min gap) —
    two independent implementations of the same semantics."""
    from bharatmlstack_spark.queries_joins import events_sessionize

    ours = events_sessionize(spark, sf_dir)
    ours_counts = {
        r["user_id"]: r["n"]
        for r in ours.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n"))
        .collect()
    }

    from bharatmlstack_spark.sources.events import load_events_ts

    ev = load_events_ts(spark, sf_dir)
    native = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    native_counts = {r["user_id"]: r["n"] for r in native.collect()}
    assert ours_counts == native_counts


def test_merge_trim_tiebreak_deterministic(spark):
    """Equal-ts events within a (user, week): the trim must be a total
    order (ts desc, then tiebreak desc), not whatever partition order
    row_number saw."""
    from bharatmlstack_spark.operators.event_store import EventStore

    rows = [(1, "2024-01-02 10:00:00", eid) for eid in [5, 3, 9, 1, 7]]
    df = (
        spark.createDataFrame(rows, "user_id long, ts string, event_id long")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    store = EventStore(max_per_week=2, tiebreak_cols=["event_id"])
    for _ in range(3):  # repartition shuffles input order across runs
        kept = sorted(
            r.event_id
            for r in store.merge_trim(df.repartition(4)).collect()
        )
        assert kept == [7, 9]


def test_retention_filter_24_week_cutoff(store, spark):
    """SS3 predicate form: rows older than 24 weeks before `now` drop,
    rows at or inside the boundary survive (inclusive >=)."""
    now = datetime(2024, 1, 20, tzinfo=timezone.utc)
    cutoff = now.timestamp() - 24 * 7 * 24 * 3600
    rows = [
        (1, datetime.fromtimestamp(cutoff - 1, tz=timezone.utc)),        # just outside
        (2, datetime.fromtimestamp(cutoff, tz=timezone.utc)),            # exactly on
        (3, datetime.fromtimestamp(cutoff + 3600, tz=timezone.utc)),     # inside
        (4, now),                                                        # now itself
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = store.retention_filter(df, F.lit(now.replace(tzinfo=None)).cast("timestamp"))
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3, 4]
