"""Versioned IVF index: stream UPSERT support (r13) — skye's actual
re-publish semantics (an entity's embedding changes and must REPLACE
the indexed one). The sink maintains an id-bucketed (id, gen) registry
beside the root so re-arrivals are detected in O(batch); update-
tombstones mask old generations immediately; folds purge index AND
registry; refit keeps the gen column alive."""

import json
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from bharatmlstack_spark.operators.lsh import IvfIndex
from bharatmlstack_spark.streaming.ingest import (
    GEN_MAX,
    IVF_IDS_SUFFIX,
    await_stream,
    compact_streamed_index,
    delete_indexed_vectors,
    fold_index_tombstones,
    read_streamed_ivf_index,
    refit_streamed_index,
    stream_ann_ivf_sink,
    stream_semantic_dedup_sink,
)


def _vec(seed, dim=4):
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.normal(size=dim)]


V0 = {i: _vec(i) for i in range(12)}
# ids 3 and 7 re-publish with NEW embeddings (far from the old ones so
# the cell assignment actually moves)
V1 = {3: [9.0, 9.0, 9.0, 9.0], 7: [-9.0, -9.0, -9.0, -9.0]}


def _fit_ivf(spark):
    df = spark.createDataFrame(
        sorted(V0.items()), "vec_id long, embedding array<float>"
    )
    return IvfIndex(n_cells=3).fit(df, sample_size=32, iters=3)


def _run_sink(spark, tmp_path, ivf, index_path, topic, ck):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_ann_ivf_sink(
        stream, ivf, index_path, str(tmp_path / ck), spark,
        trigger_once=True, allow_updates=True,
    )
    await_stream(q, 300, "versioned ivf sink")


def _latest(spark):
    latest = dict(V0)
    latest.update(V1)
    return {i: tuple(round(x, 5) for x in v) for i, v in latest.items()}


def _read_vecs(spark, index_path, dedup=True):
    return {
        r["vec_id"]: tuple(round(float(x), 5) for x in r["embedding"])
        for r in read_streamed_ivf_index(
            spark, index_path, dedup=dedup
        ).collect()
    }


@pytest.fixture(scope="module")
def _updated_index_base(spark, tmp_path_factory):
    """The 2-batch streamed upsert build, ONCE per module: tests mutate
    the index (fold/refit/delete), so each gets its own copytree copy of
    the whole root (index + sibling __ids/__quantizer sidecars) — the
    per-test streaming rebuild was ~30 s x 7 tests of suite wall-clock;
    the copy is a few KB of parquet."""
    base = tmp_path_factory.mktemp("ivf_upd_base")
    ivf = _fit_ivf(spark)
    topic = str(base / "topic")
    index_path = str(base / "root" / "index")
    os.makedirs(str(base / "root"))
    spark.createDataFrame(
        sorted(V0.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(topic)  # one file -> batch 0
    _run_sink(spark, base, ivf, index_path, topic, "ck")
    spark.createDataFrame(
        sorted(V1.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(topic)  # -> batch 1
    _run_sink(spark, base, ivf, index_path, topic, "ck")
    return ivf, str(base / "root")


@pytest.fixture()
def updated_index(_updated_index_base, tmp_path):
    import shutil

    ivf, root = _updated_index_base
    dst = str(tmp_path / "root")
    shutil.copytree(root, dst)
    return ivf, os.path.join(dst, "index")


def test_upsert_replaces_vector_immediately(spark, updated_index):
    """Before any fold, the reader serves exactly one row per id with
    the LATEST embedding — the re-published vectors moved cells and the
    old assignments are masked."""
    _, index_path = updated_index
    assert _read_vecs(spark, index_path) == _latest(spark)
    # the registry recorded both generations for the updated ids
    reg = spark.read.parquet(index_path + IVF_IDS_SUFFIX)
    gens = {(r["id"], r["gen"]) for r in reg.collect()}
    assert {(3, 0), (3, 1), (7, 0), (7, 1)} <= gens
    # tombstones exist ONLY for the two genuine re-arrivals
    t = spark.read.parquet(f"{index_path}/_tombstones")
    assert {(r["id"], r["gen_lt"]) for r in t.collect()} == {(3, 1), (7, 1)}


def test_fold_purges_index_and_registry(spark, updated_index):
    _, index_path = updated_index
    want = _latest(spark)
    stats = fold_index_tombstones(spark, index_path)
    assert stats["tombstones"] == 2
    assert stats["rows_removed"] == 2 and stats["registry_removed"] == 2
    assert not os.path.exists(f"{index_path}/_tombstones")
    raw = spark.read.parquet(index_path)
    assert raw.count() == len(V0)  # one live generation per id
    assert _read_vecs(spark, index_path, dedup=False) == want
    reg = spark.read.parquet(index_path + IVF_IDS_SUFFIX)
    assert reg.count() == len(V0)


def test_redelivery_idempotent_then_compact(spark, tmp_path):
    """Full redelivery of both batches under a fresh checkpoint: the
    new epoch re-applies every vector as an update (correct, tombstone
    cost O(corpus), reclaimed by the compaction), and the read serves
    exactly the latest corpus before AND after the fold."""
    import time

    ivf = _fit_ivf(spark)
    topic = str(tmp_path / "topic")
    index_path = str(tmp_path / "index")
    now = time.time()
    p0 = spark.createDataFrame(
        sorted(V0.items()), "vec_id long, embedding array<float>"
    )
    p0.coalesce(1).write.parquet(topic)
    for f in os.listdir(topic):
        os.utime(os.path.join(topic, f), (now - 60, now - 60))
    spark.createDataFrame(
        sorted(V1.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(topic)
    for ck in ("ck1", "ck2"):
        _run_sink(spark, tmp_path, ivf, index_path, topic, ck)
    t = spark.read.parquet(f"{index_path}/_tombstones")
    gen_lts = {(r["id"], r["gen_lt"]) for r in t.collect()}
    # ck1's genuine updates at epoch 0, plus ck2's redelivery
    # re-applying every vector at the NEW epoch (gen_base rolled
    # forward — the contract that makes fresh-checkpoint updates land
    # NEWER than live rows instead of silently below them)
    assert {(3, 1), (7, 1)} <= gen_lts
    assert {(i, 2) for i in V0} <= gen_lts
    assert _read_vecs(spark, index_path) == _latest(spark)
    compact_streamed_index(spark, index_path)
    assert not os.path.exists(f"{index_path}/_tombstones")
    assert _read_vecs(spark, index_path, dedup=False) == _latest(spark)


def test_refit_keeps_gens_and_later_updates_still_mask(spark, updated_index, tmp_path):
    """The reset job folds, re-assigns, and must KEEP the gen column —
    a post-refit update wave still replaces its target."""
    from bharatmlstack_spark.streaming.ingest import (
        load_streamed_index_quantizer,
    )

    ivf, index_path = updated_index
    refit_streamed_index(spark, index_path, target_cell_rows=4)
    new_ivf = load_streamed_index_quantizer(spark, index_path)
    assert "gen" in spark.read.parquet(index_path).columns
    assert _read_vecs(spark, index_path) == _latest(spark)
    # a THIRD generation for id 3 through the refit quantizer
    topic2 = str(tmp_path / "topic2")
    spark.createDataFrame(
        [(3, [5.0, 5.0, 5.0, 5.0])], "vec_id long, embedding array<float>"
    ).write.parquet(topic2)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(topic2)
    q = stream_ann_ivf_sink(
        stream, new_ivf, index_path, str(tmp_path / "ck3"), spark,
        trigger_once=True, allow_updates=True,
    )
    await_stream(q, 300, "post-refit update")
    got = _read_vecs(spark, index_path)
    assert got[3] == (5.0, 5.0, 5.0, 5.0)


def test_delete_on_versioned_index_kills_all_gens(spark, updated_index):
    _, index_path = updated_index
    assert delete_indexed_vectors(spark, index_path, [3]) == 1
    t = spark.read.parquet(f"{index_path}/_tombstones")
    assert (3, GEN_MAX) in {(r["id"], r["gen_lt"]) for r in t.collect()}
    assert 3 not in _read_vecs(spark, index_path)
    fold_index_tombstones(spark, index_path)
    reg = spark.read.parquet(index_path + IVF_IDS_SUFFIX)
    assert reg.filter(F.col("id") == 3).count() == 0


def test_versioned_flag_mismatch_refused(spark, updated_index, tmp_path):
    ivf, index_path = updated_index
    topic = str(tmp_path / "topic")
    spark.createDataFrame(
        sorted(V1.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(topic)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(topic)
    with pytest.raises(RuntimeError, match="versioned"):
        stream_ann_ivf_sink(
            stream, ivf, index_path, str(tmp_path / "ck_bad"), spark,
            trigger_once=True, allow_updates=False,
        )


def test_semantic_sink_refuses_versioned_index(spark, updated_index, tmp_path):
    ivf, index_path = updated_index
    topic = str(tmp_path / "topic")
    spark.createDataFrame(
        sorted(V1.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(topic)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(topic)
    with pytest.raises(RuntimeError, match="VERSIONED"):
        stream_semantic_dedup_sink(
            stream, ivf, index_path, str(tmp_path / "pairs"),
            str(tmp_path / "ck_sd"), spark, trigger_once=True,
        )


def test_stream_upsert_ann_search_matches_duckdb_oracle(spark):
    """Driver-identical comparison for the staged vector-upsert row:
    both query families (new embeddings find themselves at 1.0, old
    embeddings find brute force's pick over the latest corpus) against
    the DuckDB twin."""
    import duckdb

    from bharatmlstack_spark.queries_text import (
        STAGED_ORACLES,
        stream_upsert_ann_search,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = stream_upsert_ann_search(spark, sf)
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    rel = con.sql(STAGED_ORACLES["stream_upsert_ann_search"])
    idx = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in idx) for r in rel.fetchall())
    assert len(got) > 0
    assert got == ref


def test_ivf_full_delete_always_due_under_versioned_cadence(
    spark, updated_index
):
    """Erasure waves must not wait out the versioned cadence: a full
    delete sets full_delete_pending (always-due even with
    count_tombstones=False, which ignores the fixture's steady-state
    update tombstones); the fold clears it."""
    from bharatmlstack_spark.streaming.ingest import maintenance_due

    _, index_path = updated_index
    assert not maintenance_due(
        spark, index_path, every_n_batches=10_000, count_tombstones=False
    )
    assert delete_indexed_vectors(spark, index_path, [5]) == 1
    assert maintenance_due(
        spark, index_path, every_n_batches=10_000, count_tombstones=False
    )
    fold_index_tombstones(spark, index_path)
    assert not maintenance_due(
        spark, index_path, every_n_batches=10_000, count_tombstones=False
    )


def test_ivf_duplicate_ids_in_one_batch_refused(spark, tmp_path):
    """Two embeddings for one id in ONE micro-batch would land under
    the same generation (the registry probe tombstones neither, dedup
    picks arbitrarily) — the versioned sink raises instead."""
    ivf = _fit_ivf(spark)
    topic = str(tmp_path / "topic")
    spark.createDataFrame(
        [(5, _vec(5)), (5, _vec(105)), (6, _vec(6))],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.parquet(topic)
    with pytest.raises(Exception, match="duplicate ids"):
        _run_sink(
            spark, tmp_path, ivf, str(tmp_path / "index"), topic, "ck"
        )


def test_ivf_meta_rolls_gen_base_before_appends(spark, updated_index):
    """Cross-checkpoint monotonicity invariant: after every committed
    batch the sidecar's next_gen_base exceeds every live generation
    (index AND registry) — the sink writes the sidecar BEFORE the
    appends, so no crash window can leave next_gen_base <= a live gen
    and let a fresh checkpoint re-issue it."""
    from bharatmlstack_spark.operators.feature_store import read_table_meta

    _, index_path = updated_index
    nxt = int(read_table_meta(spark, index_path)["next_gen_base"])
    live = read_streamed_ivf_index(spark, index_path, dedup=False)
    max_live = live.agg(F.max("gen")).collect()[0][0]
    reg = spark.read.parquet(index_path + IVF_IDS_SUFFIX)
    max_reg = reg.agg(F.max("gen")).collect()[0][0]
    assert nxt > int(max_live) and nxt > int(max_reg)


def test_ivf_refused_batch_leaves_sidecar_untouched(spark, tmp_path):
    """The dup-id refusal must run BEFORE the meta write (r14 ADVICE):
    a sidecar bump for a batch that never appended would advance
    next_gen_base and last_batch_id, so the legitimate retry of the
    SAME batch_id trips the non-monotonic check and flags a spurious
    redelivery. Pin: refusal leaves the meta file byte-identical; the
    corrected retry of the same batch then lands with no
    redelivery_suspected and the expected generation."""
    from bharatmlstack_spark.operators.feature_store import read_table_meta

    ivf = _fit_ivf(spark)
    topic = str(tmp_path / "topic")
    index_path = str(tmp_path / "index")
    spark.createDataFrame(
        sorted(V0.items()), "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(topic)
    _run_sink(spark, tmp_path, ivf, index_path, topic, "ck")
    before = read_table_meta(spark, index_path)
    assert before["last_batch_id"] == 0
    assert "redelivery_suspected" not in before

    # batch 1 carries two embeddings for id 5 → refused loudly
    import glob as _glob

    spark.createDataFrame(
        [(5, _vec(105)), (5, _vec(205))],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("append").parquet(topic)
    new_files = sorted(
        _glob.glob(os.path.join(topic, "*.parquet")), key=os.path.getmtime
    )
    with pytest.raises(Exception, match="duplicate ids"):
        _run_sink(spark, tmp_path, ivf, index_path, topic, "ck")
    assert read_table_meta(spark, index_path) == before

    # fix the batch IN PLACE (the offset log pins the file path, so the
    # checkpoint re-attempts the SAME batch_id with corrected content)
    import shutil

    bad = new_files[-1]
    fix_dir = str(tmp_path / "fixed")
    spark.createDataFrame(
        [(5, _vec(105))], "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(fix_dir)
    fixed = _glob.glob(os.path.join(fix_dir, "*.parquet"))[0]
    shutil.copyfile(fixed, bad)
    # drop the stale Hadoop .crc sidecar for the rewritten file
    crc = os.path.join(topic, f".{os.path.basename(bad)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run_sink(spark, tmp_path, ivf, index_path, topic, "ck")
    after = read_table_meta(spark, index_path)
    assert after["last_batch_id"] == 1
    assert "redelivery_suspected" not in after
    assert after["next_gen_base"] == before["next_gen_base"] + 1
    assert _read_vecs(spark, index_path)[5] == tuple(
        round(float(x), 5) for x in _vec(105)
    )
