"""Product-quantization tests: determinism, code shape, compression
fidelity (ADC recall vs exact KNN), and monotone codebook behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.pq import PqIndex, _kmeans


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_deterministic_and_centered():
    x = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0]], dtype=np.float32)
    c1 = _kmeans(x, k=2, iters=5)
    c2 = _kmeans(x, k=2, iters=5)
    assert np.array_equal(c1, c2)
    want = np.array([[0.05, 0.0], [10.05, 10.0]], dtype=np.float32)
    got = c1[np.argsort(c1[:, 0])]
    assert np.allclose(got, want, atol=1e-6)


def test_encode_shape_and_determinism(emb):
    idx = PqIndex(m=16, k=64).fit(emb, sample_size=256)
    codes = idx.encode(emb).orderBy("vec_id")
    first = codes.head(3)
    assert all(len(r.codes) == 16 for r in first)
    assert all(0 <= c < 64 for r in first for c in r.codes)
    again = PqIndex(m=16, k=64).fit(emb, sample_size=256).encode(emb).orderBy("vec_id").head(3)
    assert [r.codes for r in first] == [r.codes for r in again]


def test_adc_recall_vs_exact_knn(spark, emb):
    q = np.array(emb.filter(F.col("vec_id") == 0).head().embedding, dtype=np.float32)
    cands = emb.filter(F.col("vec_id") >= 5)
    # exact top-10 by dot
    rows = cands.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float32)
    exact = set(ids[np.argsort(-(X @ q), kind="stable")[:10]].tolist())

    idx = PqIndex(m=16, k=64).fit(cands, sample_size=1024)
    got = {r.vec_id for r in idx.search(
        idx.encode(cands), q, k=10, rerank=cands, shortlist=50).collect()}
    recall = len(got & exact) / 10
    assert recall >= 0.8, recall  # ADC shortlist + exact re-rank recovers the true top-k


def test_fit_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(1, [0.0] * 10)], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        PqIndex(m=4, k=4).fit(df, sample_size=8)
