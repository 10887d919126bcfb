"""IVF-PQ (operators/ivfpq.py): the composed coarse-cells + residual-PQ
ANN index. Covers determinism, storage shape, the residual-ADC score
decomposition, cell pruning (probed cells only), recall through the
two-stage search, and the STAGED driver comparison for the pinned
``ann_ivfpq_topk`` row (graduates via the dedup_ngram_jaccard
retirement, head of the second-generation list in queries.py)."""

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.ivfpq import IvfPqIndex

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def fitted(spark, emb):
    cands = emb.filter(F.col("vec_id") >= 5)
    idx = IvfPqIndex(n_cells=8, m=16, k=64).fit(cands, sample_size=512)
    return idx, cands


def test_index_shape_and_determinism(spark, emb, fitted):
    idx, cands = fitted
    codes = idx.index(cands).orderBy("vec_id")
    first = codes.head(5)
    assert all(len(r.codes) == 16 for r in first)
    assert all(0 <= c < 64 for r in first for c in r.codes)
    assert all(0 <= r.cell < 8 for r in first)
    again = (
        IvfPqIndex(n_cells=8, m=16, k=64)
        .fit(cands, sample_size=512)
        .index(cands)
        .orderBy("vec_id")
        .head(5)
    )
    assert [(r.cell, r.codes) for r in first] == [
        (r.cell, r.codes) for r in again
    ]


def test_cell_assignment_matches_ivf(spark, fitted):
    """The composed index must bucket exactly like the bare IvfIndex it
    wraps — a drifted assignment would make nprobe pruning read the
    wrong rows."""
    idx, cands = fitted
    ours = {
        r.vec_id: r.cell for r in idx.index(cands).collect()
    }
    bare = {
        r["vec_id"]: r["cell"]
        for r in idx.ivf.index(cands).select("vec_id", "cell").collect()
    }
    assert ours == bare


def test_search_reads_only_probed_cells(spark, fitted):
    """ADC candidates are filtered to the nprobe nearest cells BEFORE
    any scoring — the pruning that makes the index sub-linear."""
    idx, cands = fitted
    q = np.array(
        cands.orderBy("vec_id").head().embedding, dtype=np.float64
    )
    codes = idx.index(cands)
    cents = np.asarray(idx.ivf.centroids, dtype=np.float64)
    cdist = ((cents - q[None, :]) ** 2).sum(1)
    probe = set(np.argsort(cdist, kind="stable")[:2].astype(int).tolist())
    # ADC-only search (no rerank) over nprobe=2: every hit's cell must
    # be one of the two probed cells
    hits = idx.search(codes, q, k=20, nprobe=2).select("vec_id")
    hit_cells = {
        r.cell
        for r in codes.join(hits, "vec_id", "left_semi").collect()
    }
    assert hit_cells <= probe


def test_residual_adc_decomposition_exact(spark, fitted):
    """score(candidate) == dot(centroid_cell, q) + sum_j table[j, code]
    — verify the pandas_udf against a pure-numpy recomputation for
    every candidate (ADC is approximate vs the raw vectors, but must be
    EXACT vs its own decomposition)."""
    idx, cands = fitted
    q = np.array(
        cands.orderBy(F.desc("vec_id")).head().embedding, dtype=np.float64
    )
    codes = idx.index(cands)
    got = {
        r.vec_id: r.score
        for r in idx.search(codes, q, k=1000, nprobe=8).collect()
    }
    cents = np.asarray(idx.ivf.centroids, dtype=np.float64)
    books, m = idx.codebooks, idx.m
    sub = books.shape[2]
    table = np.stack(
        [books[j].astype(np.float64) @ q[j * sub : (j + 1) * sub] for j in range(m)]
    )
    for r in codes.collect():
        want = cents[r.cell] @ q + sum(
            table[j, r.codes[j]] for j in range(m)
        )
        assert got[r.vec_id] == pytest.approx(want, rel=1e-12)


def test_two_stage_recall_vs_exact(spark, fitted):
    idx, cands = fitted
    rows = cands.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    q = np.array(
        cands.filter(F.col("vec_id") == ids.min().item()).head().embedding,
        dtype=np.float64,
    )
    exact = set(ids[np.argsort(-(X @ q), kind="stable")[:10]].tolist())
    got = {
        r.vec_id
        for r in idx.search(
            idx.index(cands), q, k=10, nprobe=6, rerank=cands, shortlist=100
        ).collect()
    }
    assert len(got & exact) / 10 >= 0.8


def test_fit_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([(i, [float(i)] * 10) for i in range(20)],
                               ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        IvfPqIndex(n_cells=2, m=4, k=4).fit(df, sample_size=16)


def test_ann_ivfpq_topk_matches_duckdb_oracle(spark):
    """The driver's exact comparison on the STAGED (query, oracle) pair
    — same columns, order-insensitive values — until the row graduates
    onto the pinned dedup_ngram_jaccard retirement slot."""
    from bharatmlstack_spark.queries_text import (
        STAGED_ORACLES,
        ann_ivfpq_topk,
    )

    out = ann_ivfpq_topk(spark, SF_DIR)
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    assert len(got) == 10
    assert all(r[sorted(out.columns).index("recall_ok")] for r in got)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    rel = con.sql(STAGED_ORACLES["ann_ivfpq_topk"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref


def test_k_above_tinyint_range_refused():
    """Codes are stored array<tinyint>: k=256 (the conventional PQ
    setting) would silently wrap codes >=128 negative and _adc would
    gather from the wrong end of the table (r14 ADVICE). Refuse loudly
    at construction."""
    with pytest.raises(ValueError, match="tinyint"):
        IvfPqIndex(k=256)
    IvfPqIndex(k=128)  # boundary ok


def test_pq_trains_on_ivf_retained_sample(spark, fitted):
    """The PQ codebooks must train on LITERALLY the sample IvfIndex.fit
    trained the coarse centroids on (including its hash-threshold
    thinning / small-input fallback), not an independently re-collected
    one (r14 ADVICE): recompute the residual k-means from the retained
    sample and require bit-equality."""
    from bharatmlstack_spark.operators.pq import _kmeans

    idx, _ = fitted
    x = np.asarray(idx.ivf._fit_sample, dtype=np.float64)
    cents = np.asarray(idx.ivf.centroids, dtype=np.float64)
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    resid = (x - cents[d.argmin(axis=1)]).astype(np.float32)
    sub = x.shape[1] // idx.m
    books = np.stack(
        [
            _kmeans(resid[:, j * sub : (j + 1) * sub], idx.k, idx.fit_iters)
            for j in range(idx.m)
        ]
    )
    assert np.array_equal(books, idx.codebooks)
