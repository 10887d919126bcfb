"""Document deletion in the streaming near-dup state — the family's
third tombstone surface (postings: test_stream_bm25; IVF:
test_index_delete): immediate masking in cross_dedup_against_state, a
loud pending-deletion refusal in the live sink, physical purge through
fold_neardup_tombstones / compact_neardup_state."""

import json
import os

import pytest

from pyspark.sql import functions as F

from bharatmlstack_spark.streaming.ingest import (
    NEARDUP_TOMBSTONES_DIR,
    await_stream,
    compact_neardup_state,
    cross_dedup_against_state,
    delete_neardup_docs,
    fold_neardup_tombstones,
    stream_neardup_minhash_sink,
)

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "completely different text about shuffle exchanges and partitions"


@pytest.fixture()
def state(spark, tmp_path):
    """A bucketed near-dup state indexing two unrelated docs."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": DOC_A}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": DOC_B}) + "\n")
    state_dir, out = str(tmp_path / "state"), str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_neardup_minhash_sink(
        stream, state_dir, out, str(tmp_path / "ck"), spark,
        id_col="doc_id", text_col="text", trigger_once=True,
        state_buckets=4,
    )
    await_stream(q, 120, "neardup delete-test sink")
    return state_dir, src, out


def _probe(spark, state_dir):
    """An incoming near-copy of DOC_A: flags doc 1 unless it's deleted."""
    incoming = spark.createDataFrame(
        [(100, DOC_A + " zz9")], "doc_id long, text string"
    )
    return cross_dedup_against_state(
        spark, state_dir, incoming, threshold=0.8
    )


def test_deleted_doc_stops_flagging_immediately(spark, state):
    """The stored doc flags its near-copy; after delete_neardup_docs the
    SAME probe returns nothing — before any physical fold."""
    state_dir, _, _ = state
    assert [r["id_a"] for r in _probe(spark, state_dir).collect()] == [1]
    assert delete_neardup_docs(spark, state_dir, [1]) == 1
    assert _probe(spark, state_dir).count() == 0


def test_sink_refuses_while_deletions_pending(spark, state):
    """The live sink's probe reads band dirs directly — it must refuse
    to append until the tombstones are folded, then resume cleanly."""
    state_dir, src, out = state
    delete_neardup_docs(spark, state_dir, [1])
    with open(os.path.join(src, "b1.json"), "w") as f:
        f.write(json.dumps({"doc_id": 3, "text": "yet another doc"}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_neardup_minhash_sink(
        stream, state_dir, out, src + "_ck2", spark,
        id_col="doc_id", text_col="text", trigger_once=True,
        state_buckets=4,
    )
    with pytest.raises(Exception, match="pending deletions"):
        await_stream(q, 120, "neardup sink (pending tombstones)")
    stats = fold_neardup_tombstones(spark, state_dir)
    assert stats["tombstones"] == 1
    assert stats["sets_removed"] == 1 and stats["bands_removed"] > 0
    sets = spark.read.parquet(f"{state_dir}/sets")
    assert sets.filter(F.col("id") == 1).count() == 0
    bands = spark.read.parquet(f"{state_dir}/bands")
    assert bands.filter(F.col("id") == 1).count() == 0
    # folded: the sink resumes
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = stream_neardup_minhash_sink(
        stream, state_dir, out, src + "_ck3", spark,
        id_col="doc_id", text_col="text", trigger_once=True,
        state_buckets=4,
    )
    await_stream(q, 120, "neardup sink (after fold)")
    assert spark.read.parquet(f"{state_dir}/sets").filter(
        F.col("id") == 3
    ).count() == 1


def test_compact_folds_neardup_tombstones(spark, state):
    """compact_neardup_state folds pending deletions first, clearing the
    sink's refusal through the normal maintenance pass."""
    state_dir, _, _ = state
    delete_neardup_docs(spark, state_dir, [2])
    compact_neardup_state(spark, state_dir)
    assert not os.path.exists(f"{state_dir}/{NEARDUP_TOMBSTONES_DIR}")
    assert spark.read.parquet(f"{state_dir}/sets").filter(
        F.col("id") == 2
    ).count() == 0
    # doc 1 untouched, still flags its near-copy
    assert [r["id_a"] for r in _probe(spark, state_dir).collect()] == [1]
