"""Per-batch corpus-stats rollforward (_roll_postings_stats): an
actively-appending postings stream keeps the searches' cached
(n_docs, sum_dl) live — stamped fresh after every exact append, left
behind (scan fallback) on redelivery or blended batches, and equal to
the MASKED deduped doclen aggregate on versioned update streams."""

import json
import os

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.feature_store import read_table_meta
from bharatmlstack_spark.streaming.ingest import (
    MAINT_COUNTER_KEY,
    _mask_tombstoned,
    _postings_tombstones,
    await_stream,
    bm25_search_streamed,
    compact_streamed_postings,
    stream_postings_sink,
)


def _write_batch(src, name, docs, mtime):
    path = os.path.join(src, name)
    with open(path, "w") as f:
        for i, text in docs:
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


def _run(spark, src, index_path, ck, **kw):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_postings_sink(
        stream, index_path, ck, spark, n_buckets=4, trigger_once=True, **kw
    )
    await_stream(q, 300, "postings sink (stats rollforward)")


def _stamp_fresh(meta) -> bool:
    return (
        "n_docs" in meta
        and "stats_counter" in meta
        and int(meta["stats_counter"]) == int(meta[MAINT_COUNTER_KEY])
    )


def test_appending_stream_keeps_cache_live(spark, tmp_path):
    """Two appended micro-batches, zero compactions: the sidecar stats
    stay stamped fresh and equal the doclen scan exactly — and a third
    append keeps them fresh again."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", [(1, "alpha beta"), (2, "beta gamma delta")], 1e9)
    _write_batch(src, "b1.json", [(3, "alpha"), (4, "gamma gamma")], 1e9 + 60)
    index_path = str(tmp_path / "index")
    _run(spark, src, index_path, str(tmp_path / "ck"))
    meta = read_table_meta(spark, index_path)
    assert _stamp_fresh(meta)
    assert int(meta[MAINT_COUNTER_KEY]) == 2  # two batches, no compaction
    dl = spark.read.parquet(f"{index_path}/doclen")
    assert meta["n_docs"] == 4 == dl.count()
    assert meta["sum_dl"] == dl.agg(F.sum("dl")).collect()[0][0]
    _write_batch(src, "b2.json", [(5, "epsilon zeta eta theta")], 1e9 + 120)
    _run(spark, src, index_path, str(tmp_path / "ck"))
    meta = read_table_meta(spark, index_path)
    assert _stamp_fresh(meta) and meta["n_docs"] == 5
    assert meta["sum_dl"] == (2 + 3) + (1 + 2) + 4


def test_cached_and_scan_paths_identical_mid_stream(spark, tmp_path):
    """Mid-stream (no compaction ever ran) the cached-stats search must
    equal the forced-scan search row-for-row — the rolled integers are
    the same two numbers the scan aggregates."""
    from bharatmlstack_spark.operators.feature_store import (
        TABLE_META_FILE,
        hadoop_write_text_atomic,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", [(1, "spark join"), (2, "join query join")], 1e9)
    _write_batch(src, "b1.json", [(3, "spark spark query")], 1e9 + 60)
    index_path = str(tmp_path / "index")
    _run(spark, src, index_path, str(tmp_path / "ck"))
    meta = read_table_meta(spark, index_path)
    assert _stamp_fresh(meta)
    rows = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["score"], r["rank"]) for r in df.collect()
    )
    cached = rows(bm25_search_streamed(spark, index_path, ["spark", "join"]))
    scan_meta = dict(meta)
    for k in ("n_docs", "sum_dl", "stats_counter"):
        scan_meta.pop(k)
    hadoop_write_text_atomic(
        spark, os.path.join(index_path, TABLE_META_FILE), json.dumps(scan_meta)
    )
    scanned = rows(bm25_search_streamed(spark, index_path, ["spark", "join"]))
    assert cached == scanned and len(cached) == 3


def test_versioned_updates_roll_masked_stats(spark, tmp_path):
    """On a versioned stream the rolled stats subtract the replaced
    previous-live generations: with update-tombstones PENDING, the
    cached stats equal the masked deduped doclen aggregate — the
    numbers the masked search scans would produce."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        src, "b0.json",
        [(1, "one two three"), (2, "four five"), (3, "six")], 1e9,
    )
    # doc 2 re-arrives LONGER, doc 3 re-arrives SHORTER
    _write_batch(
        src, "b1.json",
        [(2, "four five six seven eight"), (3, "nine")], 1e9 + 60,
    )
    index_path = str(tmp_path / "index")
    _run(spark, src, index_path, str(tmp_path / "ck"), allow_updates=True)
    meta = read_table_meta(spark, index_path)
    assert _stamp_fresh(meta)
    tomb = _postings_tombstones(spark, index_path)
    assert tomb is not None  # update wave pending, cache still trusted
    dl = spark.read.parquet(f"{index_path}/doclen").dropDuplicates(["id", "gen"])
    masked = _mask_tombstoned(dl, tomb)
    want_n = masked.count()
    want_s = masked.agg(F.sum("dl")).collect()[0][0]
    assert meta["n_docs"] == want_n == 3
    assert meta["sum_dl"] == want_s == 3 + 5 + 1


def test_redelivery_leaves_stamp_behind_until_compaction(spark, tmp_path):
    """A fresh-checkpoint full redelivery re-appends byte-identical
    rows: the rollforward refuses (non-monotonic batch ids), the stamp
    falls behind the counter, searches scan — and the next compaction
    re-seeds a fresh stamp."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", [(1, "alpha beta"), (2, "gamma")], 1e9)
    index_path = str(tmp_path / "index")
    _run(spark, src, index_path, str(tmp_path / "ck1"))
    assert _stamp_fresh(read_table_meta(spark, index_path))
    _run(spark, src, index_path, str(tmp_path / "ck2"))  # full redelivery
    meta = read_table_meta(spark, index_path)
    assert not _stamp_fresh(meta)
    stats = compact_streamed_postings(spark, index_path)
    assert not stats["bailed"]
    meta = read_table_meta(spark, index_path)
    assert _stamp_fresh(meta) and meta["n_docs"] == 2


def test_blended_batch_skips_rollforward(spark, tmp_path):
    """An unversioned batch carrying two rows for one doc id (the
    documented single-arrival contract violation) must NOT roll stats
    — 'the doc's dl' is ill-defined — leaving the scan path."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", [(7, "one version"), (7, "other words here")], 1e9)
    index_path = str(tmp_path / "index")
    _run(spark, src, index_path, str(tmp_path / "ck"))
    meta = read_table_meta(spark, index_path)
    assert not _stamp_fresh(meta)
