"""purge_docs_everywhere: one erasure call across every state family a
corpus leaked into (postings + near-dup + IVF). Builds all three from
the same tiny corpus, purges two doc ids, and checks each family's read
surface masks immediately, fold=True purges physically, the call is
idempotent, and a per-root failure names the roots already covered."""

import json
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from bharatmlstack_spark.operators.lsh import IvfIndex
from bharatmlstack_spark.streaming.ingest import (
    await_stream,
    bm25_search_streamed,
    cross_dedup_against_state,
    purge_docs_everywhere,
    read_streamed_ivf_index,
    stream_ann_ivf_sink,
    stream_neardup_minhash_sink,
    stream_postings_sink,
)

DOCS = {
    1: "the quick brown fox jumps over the lazy dog again and again today",
    2: "completely different text about shuffle exchanges and partitions",
    3: "a third document mentioning fox and dog but mostly other words",
}


@pytest.fixture()
def all_state(spark, tmp_path):
    """The same corpus indexed into all three families (vec ids = doc
    ids, one embedding per doc)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as f:
        for i, t in DOCS.items():
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    postings = str(tmp_path / "postings_idx")
    q = stream_postings_sink(
        spark.readStream.schema("doc_id long, text string").json(src),
        postings, str(tmp_path / "ck_p"), spark,
        n_buckets=8, trigger_once=True,
    )
    await_stream(q, 120, "purge-test postings sink")

    neardup = str(tmp_path / "neardup_state")
    q = stream_neardup_minhash_sink(
        spark.readStream.schema("doc_id long, text string").json(src),
        neardup, str(tmp_path / "nd_out"), str(tmp_path / "ck_n"), spark,
        trigger_once=True, state_buckets=4,
    )
    await_stream(q, 120, "purge-test neardup sink")

    rng = np.random.default_rng(5)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in DOCS],
        "vec_id long, embedding array<float>",
    )
    topic = str(tmp_path / "vtopic")
    vecs.write.parquet(topic)
    ivf = str(tmp_path / "ivf_idx")
    idx = IvfIndex(n_cells=2).fit(vecs, sample_size=16, iters=2)
    q = stream_ann_ivf_sink(
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(topic),
        idx, ivf, str(tmp_path / "ck_v"), spark, trigger_once=True,
    )
    await_stream(q, 120, "purge-test ivf sink")
    return postings, neardup, ivf


def _visible(spark, postings, neardup, ivf):
    """Which of the purged ids each family still serves."""
    seen_p = {
        r["doc_id"]
        for r in bm25_search_streamed(
            spark, postings, ["fox", "dog", "shuffle"], k=10
        ).collect()
    }
    probe = spark.createDataFrame(
        [(100, DOCS[1] + " zz9")], "doc_id long, text string"
    )
    seen_n = {
        r["id_a"]  # the stored reference doc a probe near-copy flags
        for r in cross_dedup_against_state(
            spark, neardup, probe, threshold=0.8
        ).collect()
    }
    seen_v = {
        r["vec_id"] for r in read_streamed_ivf_index(spark, ivf).collect()
    }
    return seen_p, seen_n, seen_v


def test_purge_masks_all_families_then_folds(spark, all_state):
    postings, neardup, ivf = all_state
    seen_p, seen_n, seen_v = _visible(spark, postings, neardup, ivf)
    assert {1, 3} <= seen_p and 1 in seen_n and seen_v == {1, 2, 3}

    report = purge_docs_everywhere(
        spark, [1, 3],
        postings_roots=[postings], neardup_roots=[neardup], ivf_roots=[ivf],
    )
    assert set(report) == {postings, neardup, ivf}
    assert all(e["tombstones"] == 2 and e["fold"] is None
               for e in report.values())
    seen_p, seen_n, seen_v = _visible(spark, postings, neardup, ivf)
    assert seen_p == {2} if 2 in seen_p else seen_p == set()
    assert not ({1, 3} & seen_p) and seen_n == set() and seen_v == {2}

    # idempotent re-run (a crash-retry), now folding physically
    report = purge_docs_everywhere(
        spark, [1, 3],
        postings_roots=[postings], neardup_roots=[neardup], ivf_roots=[ivf],
        fold=True,
    )
    for e in report.values():
        assert e["fold"] is not None
    assert not os.path.exists(f"{postings}/tombstones")
    assert not os.path.exists(f"{neardup}/tombstones")
    assert not os.path.exists(f"{ivf}/_tombstones")
    # physically gone: doclen / sets / index rows hold only survivors
    assert {r["id"] for r in
            spark.read.parquet(f"{postings}/doclen").collect()} == {2}
    assert {r["id"] for r in
            spark.read.parquet(f"{neardup}/sets").collect()} == {2}
    assert {r["vec_id"] for r in
            read_streamed_ivf_index(spark, ivf).collect()} == {2}


def test_purge_failure_names_covered_roots(spark, all_state):
    postings, neardup, ivf = all_state
    with pytest.raises(RuntimeError, match="already covered") as exc:
        purge_docs_everywhere(
            spark, [2],
            postings_roots=[postings],
            ivf_roots=[str(ivf) + "_no_such"],
        )
    assert postings in str(exc.value)  # the good root is named as done
    # and the good root's tombstone really landed (retry-safe)
    t = spark.read.parquet(f"{postings}/tombstones")
    assert {r["id"] for r in t.collect()} == {2}


def test_purge_covers_feature_store_targets(spark, tmp_path, all_state):
    """feature_targets: the same id wave hard-deletes from a feature
    table through FeatureStore.delete's eager bucket-scoped rewrite —
    the erasure call covers the ONLINE store too, not just the
    corpus-derived indexes."""
    from pyspark.sql import functions as F

    from bharatmlstack_spark import fixtures
    from bharatmlstack_spark.operators.feature_store import FeatureStore

    postings, _, _ = all_state
    fs = FeatureStore(
        spark, fixtures.user_registry(), str(tmp_path / "feat"), n_buckets=4
    )
    fs.persist(
        "user",
        spark.createDataFrame(
            [(i, 20 + i) for i in (1, 2, 3)],
            "user_id long, demo_int32__age int",
        ),
    )
    report = purge_docs_everywhere(
        spark, [1, 3],
        postings_roots=[postings],
        feature_targets=[(fs, "user")],
    )
    feat_root = fs._table_path("user")
    assert report[feat_root] == {
        "family": "feature_store", "rows_removed": 2, "fold": "eager",
    }
    left = spark.read.parquet(feat_root)
    assert {r["user_id"] for r in left.collect()} == {2}
    # composite-key entities are refused with directions, not mis-mapped
    import pytest as _pytest

    class _FakeEntity:
        key_columns = ["a", "b"]

    class _FakeReg:
        def entity(self, label):
            return _FakeEntity()

    class _FakeFS:
        registry = _FakeReg()

    with _pytest.raises(ValueError, match="composite key"):
        purge_docs_everywhere(
            spark, [1], feature_targets=[(_FakeFS(), "pair")]
        )
