"""Shared registry for (Spark query, DuckDB oracle) pairs."""

from __future__ import annotations

import functools
import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Oracles for RETIRED rows (queries.RETIRED): unregistered from the
# driver gate, still run against DuckDB by the staged-tier pytest
# (tests/test_staged_retired.py) with the driver's exact comparison.
# Lives here (not queries.py) so every queries_* module can register
# retired oracles without circular imports.
RETIRED_ORACLES: dict[str, str] = {}

# DataFrames persisted by a query whose cache must outlive the call (the
# caller materializes the returned plan AFTER the function returns, so the
# query itself can't try/finally-unpersist). Each registered query drains
# this list on entry, so over a sequential run (the driver's gate, bench)
# at most one query's caches are live at a time; the final query's cache is
# freed at session stop.
_PENDING_UNPERSIST: list[DataFrame] = []


def defer_unpersist(df: DataFrame) -> DataFrame:
    """Mark a persisted DataFrame to be unpersisted when the next registered
    query starts (see _PENDING_UNPERSIST)."""
    _PENDING_UNPERSIST.append(df)
    return df


# Arbitrary cleanups (DROP TABLE, rmtree a tempdir) with the same lifecycle
# as the deferred unpersists: the caller materializes the returned plan
# AFTER the query function returns, so resources the plan reads (catalog
# tables, written files) must outlive the call and are released when the
# NEXT registered query starts.
_PENDING_CLEANUP: list[Callable[[], None]] = []


def defer_cleanup(fn: Callable[[], None]) -> None:
    """Run ``fn`` when the next registered query starts (see
    _PENDING_CLEANUP); exceptions are swallowed, mirroring unpersist."""
    _PENDING_CLEANUP.append(fn)


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose removal is deferred to the next registered query —
    scratch space the RETURNED plan may still lazily read (simulated
    topics, staged writes, checkpoints). Without the deferred rmtree
    every invocation leaks its directory for the life of /tmp; a long
    gate/bench session accumulates hundreds."""
    import shutil

    d = tempfile.mkdtemp(prefix=prefix)
    _PENDING_CLEANUP.append(lambda d=d: shutil.rmtree(d, ignore_errors=True))
    return d


# the deferred queues normally drain at the NEXT query's entry; a process
# that runs a single query (targeted gate, notebook) would otherwise exit
# with its scratch dirs still on disk — drain at interpreter exit too
# (unpersist on a stopped session raises and is swallowed like always)
import atexit  # noqa: E402

atexit.register(lambda: drain_pending_unpersist())


def drain_pending_unpersist() -> None:
    while _PENDING_UNPERSIST:
        df = _PENDING_UNPERSIST.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session already stopped
            pass
    while _PENDING_CLEANUP:
        fn = _PENDING_CLEANUP.pop()
        try:
            fn()
        except Exception:  # noqa: BLE001 - best-effort resource release
            pass


def ensure_workers_have_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    The driver may import us from a sys.path entry its workers never see
    (cloudpickle serializes module-level functions by REFERENCE, so any
    pandas_udf/mapInPandas touching package code needs the package
    importable worker-side). Zipped once per SparkContext, idempotent.
    """
    sc = spark.sparkContext
    marker = "_bmls_pyfile_added"
    if getattr(sc, marker, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"bharatmlstack_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    try:
        sc.addPyFile(zip_path)
    except Exception:  # noqa: BLE001 - e.g. Spark Connect; workers share path then
        pass
    setattr(sc, marker, True)


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` declares a rows-only check (for
    genuinely non-SQL-expressible ops, e.g. xxhash-based LSH).

    LIFECYCLE CONTRACT for external callers: a registered query may
    return a LAZY plan that reads scratch paths / catalog tables whose
    cleanup is deferred to the NEXT registered query's entry (see
    scratch_dir / defer_cleanup). Materialize (collect/write) query A's
    result BEFORE invoking query B — interleaving invoke-B-then-collect-A
    reads a deleted directory and fails with a FileNotFound/
    FileSourceScan error, by design (failing loudly beats silently
    serving a leaked stale dir). The driver's gate, bench.py, and the
    tests all materialize sequentially and satisfy this."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_workers_have_package(spark)
            drain_pending_unpersist()
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
