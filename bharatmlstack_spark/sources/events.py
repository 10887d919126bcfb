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


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as stored; readable under either ts encoding."""
    # harmless when ts is already µs; required when it's ns
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # pin tz so TIMESTAMP_NTZ → TIMESTAMP casts are host-independent (and
    # match DuckDB's treat-naive-as-UTC epoch_ms)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def load_events_ms(
    spark: SparkSession, sf_dir: str, keep_ts: bool = False
) -> DataFrame:
    """events with ``ts_ms``: epoch-millis BIGINT (floored), any encoding."""
    ev = load_events_raw(spark, sf_dir)
    if dict(ev.dtypes)["ts"] == "bigint":  # legacy ns-as-long
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
        ts = F.timestamp_millis(F.expr("ts div 1000000"))
    else:
        ts = F.timestamp_millis(F.unix_millis(F.col("ts").cast("timestamp")))
    return ev.withColumn("ts", ts)
