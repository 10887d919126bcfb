"""Loader for the events stream table, robust to the parquet encoding of
``ts``.

The driver-generated ``events.parquet`` has shipped ``ts`` two ways across
testdata generations:

* int64 nanosecond epochs (parquet logical TIMESTAMP(NANOS) — Spark reads
  these only with ``spark.sql.legacy.parquet.nanosAsLong``, as BIGINT), and
* parquet ``timestamp[us]`` (isAdjustedToUTC=false), which Spark reads as
  TIMESTAMP_NTZ.

Every consumer in this package wants one of two canonical shapes —
``ts_ms`` (epoch-millis BIGINT, the wire form the reference's interaction
store uses: interaction-store/internal/handlers/events/dbops.go timestamps
are ms int64) or ``ts`` as a true TimestampType — so the type dispatch
lives here, once.

DuckDB oracle parity: oracles read the same parquet where ``ts`` is a
naive TIMESTAMP and ``epoch_ms(ts)`` floors to ms treating the naive value
as UTC. We therefore pin the Spark session timezone to UTC before casting
TIMESTAMP_NTZ → TIMESTAMP so both engines agree bit-for-bit regardless of
the host timezone the harness session was built with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# epoch-nanos for 2001-01-01 / 2100-01-01: a bigint ts outside this range is
# NOT nanoseconds (a µs-as-long generation would sit ~1000x below the floor),
# so the ms conversion below would be silently off by 1000x — fail loudly.
_NS_FLOOR = 978_307_200 * 10**9
_NS_CEIL = 4_102_444_800 * 10**9


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as stored; readable under either ts encoding."""
    # harmless when ts is already µs; required when it's ns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin tz so TIMESTAMP_NTZ → TIMESTAMP casts are host-independent (and
    # match DuckDB's treat-naive-as-UTC epoch_ms); idempotent with
    # session.py's builder conf — asserted there, enforced here for
    # sessions built elsewhere (tests, notebooks).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _assert_ns_range(ev: DataFrame, sf_dir: str) -> None:
    """Guard the bigint-is-nanos assumption (one tiny 1-row action, cached
    per path so repeated loads in a session don't rescan)."""
    if sf_dir in _checked_ns_paths:
        return
    row = ev.selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    if row.lo is not None and not (_NS_FLOOR <= row.lo and row.hi <= _NS_CEIL):
        raise ValueError(
            f"events.parquet ts is BIGINT but outside the nanosecond epoch "
            f"range [{_NS_FLOOR}, {_NS_CEIL}]: min={row.lo} max={row.hi}. "
            "A third ts encoding (µs-as-long?) shipped; update "
            "sources/events.py dispatch."
        )
    _checked_ns_paths.add(sf_dir)


_checked_ns_paths: set[str] = set()


def load_events_ms(
    spark: SparkSession, sf_dir: str, keep_ts: bool = False
) -> DataFrame:
    """events with ``ts_ms``: epoch-millis BIGINT (floored), any encoding."""
    ev = load_events_raw(spark, sf_dir)
    if dict(ev.dtypes)["ts"] == "bigint":  # legacy ns-as-long
        _assert_ns_range(ev, sf_dir)
        ms = F.expr("ts div 1000000")
    else:  # timestamp / timestamp_ntz
        ms = F.unix_millis(F.col("ts").cast("timestamp"))
    ev = ev.withColumn("ts_ms", ms)
    return ev if keep_ts else ev.drop("ts")


def load_events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as TimestampType at millisecond precision (both
    encodings floor to ms so downstream windows agree with the ms wire
    form)."""
    ev = load_events_raw(spark, sf_dir)
    if dict(ev.dtypes)["ts"] == "bigint":
        _assert_ns_range(ev, sf_dir)
        ts = F.timestamp_millis(F.expr("ts div 1000000"))
    else:
        ts = F.timestamp_millis(F.unix_millis(F.col("ts").cast("timestamp")))
    return ev.withColumn("ts", ts)
