"""Streaming gap-sessionization (streaming/ingest.stateful_sessionize):
cross-batch session continuity via applyInPandasWithState, gated by the
registered events_sessionize batch twin — plus the STAGED driver
comparison for the pinned ``stream_sessionize`` row (graduates via the
bpe_merge_step retirement, queries.py second-generation list)."""

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _run_stream(spark, tmp_path, batches, gap_ms=30 * 60 * 1000,
                evict=False, watermark_delay="10 minutes"):
    """Drive stateful_sessionize over pre-split, mtime-pinned batch
    files; return {(user, event): session}."""
    import json

    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stateful_sessionize,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i}.json")
        with open(p, "w") as f:
            for u, e, ts in rows:
                f.write(
                    json.dumps({"user_id": u, "event_id": e, "ts_ms": ts})
                    + "\n"
                )
        os.utime(p, (1_600_000_000 + i * 60,) * 2)
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts_ms long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = str(tmp_path / "out")

    def _sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stateful_sessionize(
            stream, gap_ms=gap_ms, evict_idle=evict,
            watermark_delay=watermark_delay,
        )
        .writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream(q, 300, "stateful_sessionize")
    sess_col = "session_start_ms" if evict else "session_id"
    return {
        (r.user_id, r.event_id): r[sess_col]
        for r in spark.read.parquet(out).collect()
    }


MIN = 60_000


def test_session_spans_micro_batches(spark, tmp_path):
    """A session continuing into the next micro-batch keeps its number;
    a cross-batch gap opens a new one — the state carry the batch
    window can't give an unbounded stream."""
    got = _run_stream(
        spark,
        tmp_path,
        [
            [(1, 10, 0), (1, 11, 10 * MIN)],      # session 1
            [(1, 12, 35 * MIN),                   # 25 min after 10' -> still 1
             (1, 13, 90 * MIN)],                  # 55 min gap -> session 2
            [(1, 14, 100 * MIN), (2, 20, 0)],     # u1 cont. 2; u2 starts 1
        ],
    )
    assert got == {
        (1, 10): 1, (1, 11): 1, (1, 12): 1,
        (1, 13): 2, (1, 14): 2, (2, 20): 1,
    }


def test_each_event_emitted_exactly_once(spark, tmp_path):
    rows = [[(1, i, i * MIN) for i in range(5)], [(1, i, i * MIN) for i in range(5, 9)]]
    got = _run_stream(spark, tmp_path, rows)
    assert len(got) == 9  # dict of (user,event) — a double emission would collide earlier in parquet row count
    # equal-timestamp boundary tie: never opens a session
    got2 = _run_stream(
        spark, tmp_path.joinpath("t2"), [[(7, 1, 1000)], [(7, 2, 1000)]]
    )
    assert got2 == {(7, 1): 1, (7, 2): 1}


def test_unsorted_within_batch_is_sorted_by_state_fn(spark, tmp_path):
    """Within one micro-batch rows may arrive in any order — the state
    function sorts by (ts, id) before numbering."""
    got = _run_stream(
        spark,
        tmp_path,
        [[(3, 31, 120 * MIN), (3, 30, 0)]],  # reversed arrival
    )
    assert got == {(3, 30): 1, (3, 31): 2}


def test_stream_sessionize_matches_duckdb_oracle(spark):
    """The driver's exact comparison on the STAGED (query, oracle) pair
    — the streaming form must equal the registered batch
    events_sessionize twin event-for-event."""
    from bharatmlstack_spark.queries_text import (
        STAGED_ORACLES,
        stream_sessionize,
    )

    out = stream_sessionize(spark, SF_DIR)
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    assert len(got) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    rel = con.sql(STAGED_ORACLES["stream_sessionize"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref


def test_evicting_mode_same_sessions_start_keyed(spark, tmp_path):
    """evict_idle=True must produce the SAME session grouping as the
    ordinal mode — identified by the session's first event ts instead
    of a counter (the id an eviction can never lose)."""
    B = 1_000 * MIN  # off the epoch: ts==0 sits ON the initial watermark
    got = _run_stream(
        spark,
        tmp_path,
        [
            [(1, 10, B), (1, 11, B + 10 * MIN)],
            [(1, 12, B + 35 * MIN), (1, 13, B + 90 * MIN)],
            [(1, 14, B + 100 * MIN), (2, 20, B + 101 * MIN)],
        ],
        evict=True,
    )
    assert got == {
        (1, 10): B, (1, 11): B, (1, 12): B,
        (1, 13): B + 90 * MIN, (1, 14): B + 90 * MIN,
        (2, 20): B + 101 * MIN,
    }


def test_idle_state_evicted_after_watermark(spark, tmp_path):
    """THE bounded-state pin (r14 verdict task 3): once the watermark
    passes an idle user's last_ts + gap, their state rows are REMOVED
    from the state store — state scales with the active population, not
    users ever seen. Read the store back via the statestore data
    source; only the still-active user may remain."""
    B = 1_000 * MIN
    _run_stream(
        spark,
        tmp_path,
        [
            # user 1: one event at B, then silent forever
            [(1, 10, B), (2, 20, B)],
            # user 2 stays active; max event time B+100' drives the
            # watermark to B+90' > user 1's B + 30' gap at batch 2
            [(2, 21, B + 100 * MIN)],
            [(2, 22, B + 200 * MIN)],
        ],
        evict=True,
    )
    state = (
        spark.read.format("statestore")
        .load(str(tmp_path / "ck"))
        .select("key.user_id")
        .collect()
    )
    assert sorted(r.user_id for r in state) == [2]


def test_no_evict_mode_keeps_all_state(spark, tmp_path):
    """Contrast pin: the ordinal (NoTimeout) mode keeps every user's
    state forever — the documented trade the evicting mode exists to
    close."""
    _run_stream(
        spark,
        tmp_path,
        [[(1, 10, 0), (2, 20, 0)], [(2, 21, 100 * MIN)], [(2, 22, 200 * MIN)]],
    )
    state = (
        spark.read.format("statestore")
        .load(str(tmp_path / "ck"))
        .select("key.user_id")
        .collect()
    )
    assert sorted(r.user_id for r in state) == [1, 2]
