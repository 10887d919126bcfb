"""Incremental dedup-cluster maintenance (stream_cluster_sink): the
STAGED driver comparison for the pinned ``stream_dedup_clusters`` row
(r15, rotation protocol (b) — graduates via the third-generation
candidate list in queries.py when a rotation frees a slot), plus the
state invariants the oracle equality alone doesn't spell out: the merge
log records cross-batch cluster merges, full redelivery appends ZERO
rows, compaction folds the log away without changing reads, and the
pointer-doubling resolver collapses deep union-by-min chains."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_stream_dedup_clusters_matches_duckdb_oracle(spark):
    """The driver's exact comparison on the STAGED (query, oracle) pair
    — components recomputed independently by DuckDB's recursive CTE."""
    from bharatmlstack_spark.queries_corpus import stream_dedup_clusters
    from bharatmlstack_spark.queries_text import STAGED_ORACLES

    df = stream_dedup_clusters(spark, SF_DIR)
    assert df.dtypes == [("node", "bigint"), ("component", "bigint")]
    rows = df.collect()
    cols = sorted(df.columns)
    got = sorted(tuple(r[c] for c in cols) for r in rows)
    assert got, "corpus has near-dup pairs; empty readout means sink loss"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rel = con.sql(STAGED_ORACLES["stream_dedup_clusters"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref


WAVES = [
    [(1, 2), (2, 3), (10, 11)],  # clusters {1,2,3}, {10,11}
    [(20, 21)],  # cluster {20,21}
    [(3, 10), (30, 31), (1, 2)],  # MERGES {1,2,3}+{10,11}; intra-topic redelivery
]
EXPECTED = {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20, 30: 30, 31: 30}


@pytest.fixture(
    scope="module", params=[200_000, 0], ids=["driver-tier", "distributed-tier"]
)
def _cluster_state_base(spark, tmp_path_factory, request):
    """3-wave synthetic topic with an engineered cross-batch merge, run
    TWICE (second pass = full at-least-once redelivery) — through BOTH
    execution tiers (param = batch_driver_max; 0 forces the distributed
    tier), which must write identical state.

    Module-scoped: the 6-restart streaming build runs ONCE per tier;
    each test works on its own cheap copytree copy (the per-test
    rebuild was ~40 s x 4 tests x 2 tiers of the suite's wall-clock —
    the state itself is a handful of KB-sized parquet files)."""
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_cluster_sink,
    )

    base = tmp_path_factory.mktemp(f"cluster_base_{request.param}")
    topic = str(base / "topic")
    for w in WAVES:
        spark.createDataFrame(w, "id_a long, id_b long").coalesce(1).write.mode(
            "append"
        ).parquet(topic)
    state = str(base / "state")
    for replay in ("ck1", "ck2"):
        stream = (
            spark.readStream.schema("id_a long, id_b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(topic)
        )
        q = stream_cluster_sink(
            stream,
            state_dir=state,
            checkpoint_dir=str(base / replay),
            spark=spark,
            state_buckets=4,
            trigger_once=True,
            batch_driver_max=request.param,
        )
        await_stream(q, 180)
    return state


@pytest.fixture()
def cluster_state(_cluster_state_base, tmp_path):
    """Per-test isolated copy of the once-per-tier streamed state (tests
    compact/mutate it)."""
    import shutil

    dst = str(tmp_path / "state")
    shutil.copytree(_cluster_state_base, dst)
    return dst


def test_cross_batch_merge_and_row_idempotence(spark, cluster_state):
    from bharatmlstack_spark.streaming.ingest import read_cluster_state

    got = {
        r["node"]: r["component"]
        for r in read_cluster_state(spark, cluster_state).collect()
    }
    assert got == EXPECTED
    # the (3,10) wave merged two ESTABLISHED clusters: exactly one merge
    # row, child = the losing root (10), parent = the joint minimum (1)
    merges = spark.read.parquet(f"{cluster_state}/merges").collect()
    assert [(m["child"], m["parent"]) for m in merges] == [(10, 1)]
    # full redelivery appended NOTHING: one label row per node, ever
    assert spark.read.parquet(f"{cluster_state}/labels").count() == len(EXPECTED)


def test_compaction_folds_merges(spark, cluster_state):
    from bharatmlstack_spark.streaming.ingest import (
        compact_cluster_state,
        read_cluster_state,
    )

    rep = compact_cluster_state(spark, cluster_state)
    assert rep == {"labels_rewritten": len(EXPECTED), "merges_cleared": 1}
    assert not os.path.isdir(f"{cluster_state}/merges")
    # stored labels are now canonical (resolve join no longer needed)
    lab = {
        r["node"]: r["label"]
        for r in spark.read.parquet(f"{cluster_state}/labels").collect()
    }
    assert lab == EXPECTED
    got = {
        r["node"]: r["component"]
        for r in read_cluster_state(spark, cluster_state).collect()
    }
    assert got == EXPECTED
    # idempotent second pass over a merge-free state
    assert compact_cluster_state(spark, cluster_state) == {
        "labels_rewritten": 0,
        "merges_cleared": 0,
    }


def test_bucket_count_contract(spark, cluster_state, tmp_path):
    """A run against an existing state with a different bucket count (or
    flat against bucketed) must refuse — the probe's pmod pruning would
    miss stored labels hashed with the recorded count."""
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_cluster_sink,
    )

    topic = str(tmp_path / "topic2")
    spark.createDataFrame([(50, 51)], "id_a long, id_b long").coalesce(1).write.parquet(
        topic
    )
    for bad_buckets in (8, None):
        stream = (
            spark.readStream.schema("id_a long, id_b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(topic)
        )
        q = stream_cluster_sink(
            stream,
            state_dir=cluster_state,
            checkpoint_dir=str(tmp_path / f"ckbad{bad_buckets}"),
            spark=spark,
            state_buckets=bad_buckets,
            trigger_once=True,
        )
        with pytest.raises(Exception, match="state_buckets"):
            await_stream(q, 180)


def test_merge_forest_deep_chain(spark):
    """Pointer doubling resolves a maximally deep union-by-min chain
    (5->4->3->2->1) to the single root in O(log depth) rounds."""
    from bharatmlstack_spark.streaming.ingest import _resolve_merge_forest

    chain = spark.createDataFrame(
        [(c, c - 1) for c in range(2, 7)], "child long, parent long"
    )
    res = {r["child"]: r["root"] for r in _resolve_merge_forest(chain).collect()}
    assert res == {c: 1 for c in range(2, 7)}


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_randomized_waves_match_batch_components(spark, tmp_path, seed):
    """Randomized equivalence: arbitrary pair graphs (chains, triangles,
    bridges between waves) split into 2 waves through the real sink must
    reproduce the one-shot connected_components labels exactly — the
    order-independence claim under graph shapes the engineered fixture
    doesn't cover."""
    import random

    from bharatmlstack_spark.operators.graph import connected_components
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        read_cluster_state,
        stream_cluster_sink,
    )

    rng = random.Random(seed)
    nodes = list(range(1, 120))
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(80)
        }
    )
    rng.shuffle(pairs)
    half = len(pairs) // 2
    topic = str(tmp_path / "topic")
    for wave in (pairs[:half], pairs[half:]):
        spark.createDataFrame(wave, "id_a long, id_b long").coalesce(1).write.mode(
            "append"
        ).parquet(topic)
    state = str(tmp_path / "state")
    q = stream_cluster_sink(
        spark.readStream.schema("id_a long, id_b long")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic),
        state_dir=state,
        checkpoint_dir=str(tmp_path / "ck"),
        spark=spark,
        state_buckets=4,
        trigger_once=True,
    )
    await_stream(q, 180)
    got = {
        r["node"]: r["component"]
        for r in read_cluster_state(spark, state).collect()
    }
    expected = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(pairs, "id_a long, id_b long")
        ).collect()
    }
    assert got == expected


def test_crash_window_merges_ahead_of_labels(spark, tmp_path):
    """The crash contract, exercised: a batch that appended its MERGES
    but died before its LABELS (the only partial state the sink's
    merge-first ordering can leave) must (a) keep reads correct in the
    window — merging "early" agrees with the components the pair
    evidence will prove — and (b) heal completely when the batch
    redelivers: labels appear, no duplicate or contradictory merge rows."""
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        read_cluster_state,
        stream_cluster_sink,
    )

    def deliver(wave, ck):
        topic = str(tmp_path / f"topic_{ck}")
        spark.createDataFrame(wave, "id_a long, id_b long").coalesce(1).write.parquet(
            topic
        )
        q = stream_cluster_sink(
            spark.readStream.schema("id_a long, id_b long")
            .option("maxFilesPerTrigger", 1)
            .parquet(topic),
            state_dir=state,
            checkpoint_dir=str(tmp_path / ck),
            spark=spark,
            state_buckets=4,
            trigger_once=True,
        )
        await_stream(q, 180)

    state = str(tmp_path / "state")
    deliver([(1, 2), (2, 3), (10, 11)], "ck1")  # clusters {1,2,3}, {10,11}

    # simulate the crash window of batch [(3,10),(40,41)]: its merge row
    # (10 -> 1) landed, its labels (40, 41) did not
    spark.createDataFrame([(10, 1)], "child long, parent long").coalesce(
        1
    ).write.mode("append").parquet(f"{state}/merges")

    # (a) mid-window reads are already consistent with the merged future
    mid = {
        r["node"]: r["component"] for r in read_cluster_state(spark, state).collect()
    }
    assert mid == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1}

    # (b) redelivery completes the batch: labels appear, the established
    # merge is recognized (roots already minimal — nothing re-appended)
    deliver([(3, 10), (40, 41)], "ck2")
    got = {
        r["node"]: r["component"] for r in read_cluster_state(spark, state).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 40: 40, 41: 40}
    merges = [
        (m["child"], m["parent"])
        for m in spark.read.parquet(f"{state}/merges").collect()
    ]
    assert merges == [(10, 1)]


def test_compaction_crash_window_stale_log(spark, cluster_state):
    """compact_cluster_state's crash contract: labels swap in FIRST, the
    merge log is deleted SECOND. Simulate a crash between the two — a
    canonical label store plus the stale pre-compaction log — and pin
    the docstring's claim: the stale children no longer appear as any
    stored label, so every resolve join misses and reads stay correct;
    the next compaction clears the leftover log."""
    from bharatmlstack_spark.streaming.ingest import (
        compact_cluster_state,
        read_cluster_state,
    )

    stale = [
        (m["child"], m["parent"])
        for m in spark.read.parquet(f"{cluster_state}/merges").collect()
    ]
    assert compact_cluster_state(spark, cluster_state)["merges_cleared"] == 1
    # crash simulation: the pre-compaction log re-materializes AFTER the
    # canonical labels swapped in
    spark.createDataFrame(stale, "child long, parent long").coalesce(1).write.mode(
        "append"
    ).parquet(f"{cluster_state}/merges")

    got = {
        r["node"]: r["component"]
        for r in read_cluster_state(spark, cluster_state).collect()
    }
    assert got == EXPECTED
    rep = compact_cluster_state(spark, cluster_state)
    assert rep["merges_cleared"] == len(stale)
    assert not os.path.isdir(f"{cluster_state}/merges")
    assert {
        r["node"]: r["label"]
        for r in spark.read.parquet(f"{cluster_state}/labels").collect()
    } == EXPECTED
