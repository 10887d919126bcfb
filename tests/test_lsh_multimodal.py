"""LSH/IVF ANN recall vs brute force; multimodal batch plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.knn import VectorSearch
from bharatmlstack_spark.operators.lsh import IvfIndex, LshIndex
from bharatmlstack_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )


def _brute_topk(emb, queries, k):
    cands = emb.filter(F.col("vec_id") >= 3).withColumnRenamed("vec_id", "candidate_id")
    vs = VectorSearch(id_col="candidate_id")
    out = vs.knn(cands, queries, k=k, metric="DOT")
    return {
        (r["query_id"], r["candidate_id"]) for r in out.collect()
    }


def test_lsh_recall_vs_brute_force(spark, emb, queries):
    truth = _brute_topk(emb, queries, k=10)
    cands = emb.filter(F.col("vec_id") >= 3)
    idx = LshIndex(dim=64, n_planes=16, n_bands=8)  # 2-bit bands: high recall
    indexed = idx.index(cands)
    got = idx.search(indexed, queries, k=10, metric="DOT")
    found = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_bands_validate():
    with pytest.raises(ValueError):
        LshIndex(dim=8, n_planes=10, n_bands=4)


def test_ivf_recall_vs_brute_force(spark, emb, queries):
    truth = _brute_topk(emb, queries, k=10)
    cands = emb.filter(F.col("vec_id") >= 3)
    idx = IvfIndex(n_cells=8).fit(cands, sample_size=256, iters=3)
    indexed = idx.index(cands)
    got = idx.search(indexed, queries, k=10, nprobe=4, metric="DOT")
    found = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_cells_cover_all_rows(spark, emb):
    cands = emb.limit(100)
    idx = IvfIndex(n_cells=4).fit(cands, sample_size=64, iters=2)
    indexed = idx.index(cands)
    assert indexed.filter(F.col("cell").isNull()).count() == 0
    assert indexed.count() == 100


# -- multimodal -------------------------------------------------------------


def test_extract_features_shapes(spark):
    media = synthetic_media(spark, n=9)
    out = extract_features(media, dim=8)
    rows = out.collect()
    assert len(rows) == 9
    for r in rows:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0
        norm = float(np.linalg.norm(r["feature"]))
        assert norm == pytest.approx(1.0, abs=1e-5)


def test_extract_features_deterministic(spark):
    media = synthetic_media(spark, n=4)
    a = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    b = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    assert a == b


def test_strict_decode_raises(spark):
    media = synthetic_media(spark, n=3)
    with pytest.raises(Exception):  # NotImplementedError inside the task
        extract_features(media, strict_decode=True).collect()


def test_sample_frames_video_only(spark):
    media = synthetic_media(spark, n=9)
    frames = sample_frames(media, every_n_bytes=32, max_frames=3).collect()
    assert len(frames) > 0
    ids = {r["media_id"] for r in frames}
    videos = {r["media_id"] for r in media.filter(F.col("modality") == "video").collect()}
    assert ids <= videos
    for r in frames:
        assert len(r["frame_bytes"]) <= 32


def test_resize_images_plumbing(spark):
    from bharatmlstack_spark.operators.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, n=9)
    out = resize_images(media, width=8, height=4).collect()
    by_id = {r.media_id: r for r in out}
    src = {r.media_id: r for r in media.collect()}
    assert len(out) == 9  # non-image rows pass through
    for mid, r in by_id.items():
        if src[mid].modality == "image":
            assert len(r.content) == 32  # w*h byte budget
            assert r.meta.width == 8 and r.meta.height == 4
        else:
            assert bytes(r.content) == bytes(src[mid].content)  # untouched
    # deterministic across runs
    again = {r.media_id: bytes(r.content) for r in resize_images(media, 8, 4).collect()}
    assert again == {m: bytes(r.content) for m, r in by_id.items()}


def test_resize_images_strict_raises(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from bharatmlstack_spark.operators.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, n=3)
    with _pytest.raises(Exception) as ei:
        resize_images(media, strict_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def test_lsh_jvm_and_arrow_signatures_agree(spark, sf_dir):
    """The JVM expression fallback and the Arrow matmul path must band
    identically on real data (their fold orders differ only at
    sign(projection) == 0 boundaries, measure-zero for continuous
    embeddings) — search results are therefore path-independent."""
    from pyspark.sql import functions as F

    from bharatmlstack_spark.operators.lsh import LshIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    a = LshIndex(dim=64, n_planes=16, n_bands=8, use_arrow=True)
    b = LshIndex(dim=64, n_planes=16, n_bands=8, use_arrow=False)
    sig_a = emb.select("vec_id", a._signature("embedding").alias("s")).collect()
    sig_b = emb.select("vec_id", b._signature("embedding").alias("s")).collect()
    assert {r.vec_id: r.s for r in sig_a} == {r.vec_id: r.s for r in sig_b}


def test_ivf_jvm_and_arrow_cells_agree(spark, emb):
    """The pure-JVM struct-sort fallback must assign every row to the same
    cell as the Arrow GEMM argmin (ties break to the lowest cell id on
    both), and the nprobe probe lists must match — Arrow-less clusters get
    identical search results, just slower."""
    cands = emb.limit(200)
    a = IvfIndex(n_cells=8, use_arrow=True).fit(cands, sample_size=256, iters=3)
    b = IvfIndex(n_cells=8, use_arrow=False)
    b.centroids = a.centroids
    cells_a = {r.vec_id: r.cell for r in a.index(cands).collect()}
    cells_b = {r.vec_id: r.cell for r in b.index(cands).collect()}
    assert cells_a == cells_b

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    res_a = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in a.search(a.index(cands), queries, k=5, nprobe=3).collect()
    }
    res_b = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in b.search(b.index(cands), queries, k=5, nprobe=3).collect()
    }
    assert res_a == res_b


def test_ivf_fit_deterministic_across_partitionings(spark, emb):
    """fit()'s sample is ordered by xxhash64(id) before the limit, so the
    centroids (and hence every downstream probe) are identical no matter
    how the input happens to be partitioned."""
    cands = emb.limit(500)
    c1 = IvfIndex(n_cells=8).fit(cands.repartition(1), sample_size=64, iters=2).centroids
    c2 = IvfIndex(n_cells=8).fit(cands.repartition(13, "vec_id"), sample_size=64, iters=2).centroids
    np.testing.assert_array_equal(c1, c2)


def test_ivf_full_probe_euclidean_equals_exact(spark, emb, queries):
    """nprobe == n_cells probes every cell, so the EUCLIDEAN search (the
    ascending-order branch: smaller distance = better) must equal exact
    KNN pair-for-pair — covers the metric branch the DOT rows never hit."""
    cands = emb.filter(F.col("vec_id") >= 3).withColumnRenamed("vec_id", "candidate_id")
    vs = VectorSearch(id_col="candidate_id")
    truth = {
        (r["query_id"], r["candidate_id"])
        for r in vs.knn(cands, queries, k=10, metric="EUCLIDEAN").collect()
    }
    ivf_c = emb.filter(F.col("vec_id") >= 3)
    idx = IvfIndex(n_cells=4).fit(ivf_c, sample_size=128, iters=2)
    got = idx.search(idx.index(ivf_c), queries, k=10, nprobe=4, metric="EUCLIDEAN")
    rows = got.collect()
    found = {(r["query_id"], r["vec_id"]) for r in rows}
    assert found == truth
    # per query, scores (distances) must come back ascending by rank
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["score"]))
    for q, rs in by_q.items():
        scores = [s for _, s in sorted(rs)]
        assert scores == sorted(scores), (q, scores)
