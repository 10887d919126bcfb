"""Versioned postings index: stream UPDATE support (r13). A re-arriving
doc id REPLACES its previous postings LSM-style — rows carry gen =
batch_id, the sink's per-batch doclen probe writes update-tombstones
(id, gen_lt) for re-arrivals, searches mask gen < gen_lt through the
shared broadcast anti-join, and the fold purges dead generations
physically. The oracle throughout is the batch BM25 over the LATEST
version of every doc (operators/retrieval.bm25_topk — the registered
bm25_topk twin's engine side), so blended tf, leaked old postings, or a
dropped term that keeps scoring all break the comparison."""

import json
import os

import pytest

from pyspark.sql import functions as F

from bharatmlstack_spark.operators.retrieval import bm25_topk
from bharatmlstack_spark.streaming.ingest import (
    GEN_MAX,
    await_stream,
    bm25_search_streamed,
    compact_streamed_postings,
    delete_postings_docs,
    fold_postings_tombstones,
    maintenance_due,
    phrase_search_streamed,
    rebucket_postings_index,
    stream_postings_sink,
)

V0 = {
    1: "spark join table",
    2: "query table spark spark",
    3: "join query window",
    4: "alpha beta gamma",
}
# doc 2's update DROPS both query terms it had (query, table, spark) in
# favor of unrelated text; doc 3 gains an extra 'join'; doc 4 unchanged
# text re-delivered is NOT sent (4 only exists at gen 0)
V1 = {
    2: "alpha beta unrelated entirely",
    3: "join join query window",
}


def _write_batch(src, name, docs, mtime=None):
    """``mtime`` pins the file-source processing ORDER when several
    batch files pre-exist (Spark's file stream sorts by modification
    time; a tie makes 'which version is the update' nondeterministic —
    in production the ordering comes from the source, e.g. Kafka
    offsets)."""
    path = os.path.join(src, name)
    with open(path, "w") as f:
        for i, text in docs.items():
            f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def _run_sink(spark, src, index_path, ck, **kw):
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = stream_postings_sink(
        stream, index_path, ck, spark,
        n_buckets=8, trigger_once=True, allow_updates=True, **kw,
    )
    await_stream(q, 300, "versioned postings sink")


def _latest_docs(spark):
    latest = dict(V0)
    latest.update(V1)
    return spark.createDataFrame(
        sorted(latest.items()), "doc_id bigint, text string"
    )


def _search_rows(spark, index_path, dedup=True):
    return sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_search_streamed(
            spark, index_path, ["spark", "query", "join"], k=10, dedup=dedup
        ).collect()
    )


def _oracle_rows(spark):
    return sorted(
        (r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(
            _latest_docs(spark), ["spark", "query", "join"], k=10
        ).collect()
    )


@pytest.fixture()
def updated_index(spark, tmp_path):
    """Two micro-batches: the full V0 corpus, then the V1 update wave
    (docs 2 and 3 re-arrive with new text)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", V0)
    index_path = str(tmp_path / "index")
    _run_sink(spark, src, index_path, str(tmp_path / "ck"))
    _write_batch(src, "b1.json", V1)
    _run_sink(spark, src, index_path, str(tmp_path / "ck"))
    return index_path


def test_update_masks_old_generation_immediately(spark, updated_index):
    """Before any fold, the search must already score ONLY the latest
    version of every doc — dropped terms included (doc 2 lost all its
    query terms and must vanish from the result)."""
    got = _search_rows(spark, updated_index)
    assert got == _oracle_rows(spark)
    assert 2 not in {r[0] for r in got}  # the dropped-terms doc is gone
    # the update wave left tombstones pending — maintenance is due
    assert maintenance_due(spark, updated_index, every_n_batches=10_000)


def test_update_tombstones_record_gen_boundary(spark, updated_index):
    """The sink wrote (id, gen_lt=1) exactly for the two re-arrived ids
    — first arrivals (1, 4) must not bloat the tombstone table."""
    t = spark.read.parquet(f"{updated_index}/tombstones")
    rows = {(r["id"], r["gen_lt"]) for r in t.collect()}
    assert rows == {(2, 1), (3, 1)}


def test_fold_purges_dead_generations_physically(spark, updated_index):
    """After the fold: old-gen rows are gone from postings AND doclen,
    the tombstone table is consumed, and the search (now mask-free)
    still equals the latest-version oracle."""
    want = _oracle_rows(spark)
    stats = fold_postings_tombstones(spark, updated_index)
    assert stats["tombstones"] == 2
    assert stats["postings_removed"] > 0 and stats["doclen_removed"] == 2
    assert not os.path.exists(f"{updated_index}/tombstones")
    dl = spark.read.parquet(f"{updated_index}/doclen")
    assert dl.count() == 4  # one live generation per doc
    assert dl.filter((F.col("id") == 2) & (F.col("gen") == 0)).count() == 0
    assert _search_rows(spark, updated_index) == want


def test_same_checkpoint_replay_writes_no_tombstones(spark, tmp_path):
    """Replay under the SAME checkpoint is byte-identical: the gen-base
    marker pins the epoch, the probe's gen < gen filter finds nothing
    for the first delivery's own rows, and the tombstone table's
    distinct content stays exactly the two genuine re-arrivals."""
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    _write_batch(src, "b0.json", V0, mtime=now - 60)
    _write_batch(src, "b1.json", V1, mtime=now)  # the update arrives LATER
    index_path = str(tmp_path / "index")
    _run_sink(spark, src, index_path, str(tmp_path / "ck"))
    t0 = sorted(
        (r["id"], r["gen_lt"])
        for r in spark.read.parquet(f"{index_path}/tombstones").collect()
    )
    assert set(t0) == {(2, 1), (3, 1)}
    # resuming the SAME checkpoint finds nothing new to process — the
    # live state (tombstones included) must be exactly what one pass
    # left, and the gen-base marker guarantees any true replay of an
    # uncommitted batch would re-derive identical gens
    _run_sink(spark, src, index_path, str(tmp_path / "ck"))
    t1 = sorted(
        (r["id"], r["gen_lt"])
        for r in spark.read.parquet(f"{index_path}/tombstones").collect()
    )
    assert t0 == t1
    got = _search_rows(spark, index_path)
    assert got == _oracle_rows(spark)


def test_fresh_checkpoint_redelivery_converges_as_updates(spark, tmp_path):
    """Full redelivery under a NEW checkpoint gets a NEW generation
    epoch (gen_base rolls forward in the sidecar): every redelivered
    doc re-applies as an update — tombstone cost O(corpus), folded at
    the next compaction — and the search still equals the
    latest-version oracle at every point. The epoch is what makes a
    fresh checkpoint's updates land NEWER than live rows instead of
    silently below them."""
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    _write_batch(src, "b0.json", V0, mtime=now - 60)
    _write_batch(src, "b1.json", V1, mtime=now)  # the update arrives LATER
    index_path = str(tmp_path / "index")
    for ck in ("ck1", "ck2"):  # second pass = full redelivery, new epoch
        _run_sink(spark, src, index_path, str(tmp_path / ck))
    t = spark.read.parquet(f"{index_path}/tombstones")
    gen_lts = {(r["id"], r["gen_lt"]) for r in t.collect()}
    # ck1's genuine updates at epoch 0...
    assert {(2, 1), (3, 1)} <= gen_lts
    # ...and ck2's redelivery re-applied every doc at the NEW epoch
    assert {(i, 2) for i in V0} <= gen_lts
    assert _search_rows(spark, index_path) == _oracle_rows(spark)
    stats = compact_streamed_postings(spark, index_path)
    assert not stats["bailed"]
    assert not os.path.exists(f"{index_path}/tombstones")
    got = _search_rows(spark, index_path, dedup=False)
    assert got == _oracle_rows(spark)


def test_delete_beats_update_until_fold(spark, updated_index):
    """A full delete on a versioned index is gen_lt = GEN_MAX: every
    generation dies, and the fold purges them all (deletes are terminal
    until folded — updates mask only older gens)."""
    assert delete_postings_docs(spark, updated_index, [3]) == 1
    t = spark.read.parquet(f"{updated_index}/tombstones")
    assert (3, GEN_MAX) in {(r["id"], r["gen_lt"]) for r in t.collect()}
    got = bm25_search_streamed(spark, updated_index, ["join"], k=10)
    assert 3 not in {r["doc_id"] for r in got.collect()}
    fold_postings_tombstones(spark, updated_index)
    dl = spark.read.parquet(f"{updated_index}/doclen")
    assert dl.filter(F.col("id") == 3).count() == 0  # both gens purged


def test_rebucket_preserves_versioned_results(spark, updated_index):
    """The reset job folds first, keeps the gen column, and the search
    through the re-bucketed index still equals the oracle."""
    want = _oracle_rows(spark)
    info = rebucket_postings_index(spark, updated_index, 32)
    assert info["new_buckets"] == 32
    assert "gen" in spark.read.parquet(f"{updated_index}/postings").columns
    assert _search_rows(spark, updated_index) == want


def test_phrase_search_sees_only_latest_version(spark, tmp_path):
    """Positional + versioned compose: the phrase from the OLD version
    stops matching the moment the update arrives; the new version's
    phrase matches."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", {7: "order fast order fast", 8: "noise words"})
    index_path = str(tmp_path / "index")
    _run_sink(spark, src, index_path, str(tmp_path / "ck"),
              store_positions=True)
    _write_batch(src, "b1.json", {7: "slow order only"})
    _run_sink(spark, src, index_path, str(tmp_path / "ck"),
              store_positions=True)
    old = phrase_search_streamed(spark, index_path, "order fast").collect()
    assert old == []  # the old version's phrase is dead
    new = phrase_search_streamed(spark, index_path, "slow order").collect()
    assert [(r["doc_id"], r["n_occurrences"]) for r in new] == [(7, 1)]


def test_versioned_flag_mismatch_refused_at_sink_start(spark, tmp_path):
    """Appending unversioned (gen-less) rows into a versioned index
    would make the mask silently miss them — refused like every other
    signature mismatch."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", V0)
    index_path = str(tmp_path / "index")
    _run_sink(spark, src, index_path, str(tmp_path / "ck"))
    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    with pytest.raises(Exception, match="versioned"):
        q = stream_postings_sink(
            stream, index_path, str(tmp_path / "ck2"), spark,
            n_buckets=8, trigger_once=True, allow_updates=False,
        )
        await_stream(q, 120, "mismatched sink")


def test_full_delete_always_due_under_versioned_cadence(spark, updated_index):
    """The versioned auto_maintain cadence ignores steady-state UPDATE
    tombstones (count_tombstones=False) — but an explicit erasure
    (gen_lt = GEN_MAX) sets the full_delete_pending sidecar flag and is
    ALWAYS due, so a right-to-be-forgotten wave on an auto_maintain-only
    pipeline folds at the next maintenance check instead of waiting out
    the batch counter. The fold clears the flag."""
    # update tombstones from the fixture's wave are pending, yet ignored
    assert not maintenance_due(
        spark, updated_index, every_n_batches=10_000, count_tombstones=False
    )
    assert delete_postings_docs(spark, updated_index, [4]) == 1
    assert maintenance_due(
        spark, updated_index, every_n_batches=10_000, count_tombstones=False
    )
    fold_postings_tombstones(spark, updated_index)
    assert not maintenance_due(
        spark, updated_index, every_n_batches=10_000, count_tombstones=False
    )


def test_duplicate_ids_in_one_batch_refused(spark, tmp_path):
    """Two versions of a doc in ONE micro-batch would silently blend
    into a single aggregated posting under the same generation (the
    probe tombstones neither) — the versioned sink raises instead."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    path = os.path.join(src, "b0.json")
    with open(path, "w") as f:
        f.write(json.dumps({"doc_id": 9, "text": "one version"}) + "\n")
        f.write(json.dumps({"doc_id": 9, "text": "another version"}) + "\n")
        f.write(json.dumps({"doc_id": 10, "text": "innocent bystander"}) + "\n")
    with pytest.raises(Exception, match="duplicate doc ids"):
        _run_sink(spark, src, str(tmp_path / "index"), str(tmp_path / "ck"))


def test_refused_batch_leaves_sidecar_untouched(spark, tmp_path):
    """A dup-id batch must be refused BEFORE the meta write: a sidecar
    bump for a batch that never appended would trip the non-monotonic
    batch-id check on the legitimate retry of the SAME batch_id, flag a
    spurious redelivery, and park the stats rollforward on the scan
    path permanently (r14 ADVICE). Pin: refusal leaves the meta file
    byte-identical; the corrected retry of the same batch then lands
    with no redelivery_suspected and the (n_docs, sum_dl) rollforward
    still active."""
    from bharatmlstack_spark.operators.feature_store import read_table_meta

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(src, "b0.json", V0, mtime=1_000)
    index_path = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    _run_sink(spark, src, index_path, ck)
    before = read_table_meta(spark, index_path)
    assert before["last_batch_id"] == 0
    assert "redelivery_suspected" not in before
    assert before["n_docs"] == len(V0)  # rollforward active

    # batch 1 carries two versions of doc 9 → refused loudly
    bad = os.path.join(src, "b1.json")
    with open(bad, "w") as f:
        f.write(json.dumps({"doc_id": 9, "text": "one version"}) + "\n")
        f.write(json.dumps({"doc_id": 9, "text": "another version"}) + "\n")
    os.utime(bad, (2_000, 2_000))
    with pytest.raises(Exception, match="duplicate doc ids"):
        _run_sink(spark, src, index_path, ck)
    assert read_table_meta(spark, index_path) == before

    # fix the batch IN PLACE (the offset log pins the file path, so the
    # checkpoint re-attempts the SAME batch_id with corrected content —
    # production's dedup-upstream-then-retry) → must land cleanly
    with open(bad, "w") as f:
        f.write(json.dumps({"doc_id": 9, "text": "one version"}) + "\n")
    os.utime(bad, (2_000, 2_000))
    _run_sink(spark, src, index_path, ck)
    after = read_table_meta(spark, index_path)
    assert after["last_batch_id"] == 1
    assert "redelivery_suspected" not in after
    assert after["n_docs"] == len(V0) + 1
    assert after["sum_dl"] == before["sum_dl"] + 2
