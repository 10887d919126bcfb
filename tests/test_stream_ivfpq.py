"""Streamed IVF-PQ (compressed) index: stream_ann_ivfpq_sink builds the
IVFADC rows incrementally under a frozen two-stage quantizer; the
STAGED driver comparison for the pinned ``stream_ann_ivfpq_search`` row
(r15, rotation protocol (b)) plus the determinism / sidecar-guard pins
the oracle equality alone doesn't spell out."""

import os

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _fit(spark):
    from bharatmlstack_spark.operators.ivfpq import IvfPqIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cands = emb.filter(F.col("vec_id") >= 5)
    return IvfPqIndex(n_cells=8, m=16, k=32).fit(cands, sample_size=256), cands


def _run_sink(spark, idx, topic, index_path, ck):
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_ann_ivfpq_sink,
    )

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_ann_ivfpq_sink(
        stream, idx, index_path, ck, spark, trigger_once=True
    )
    await_stream(q, 300, "ivfpq sink")


def test_streamed_codes_equal_batch_index(spark, tmp_path):
    """The whole correctness argument in one pin: the deduped streamed
    rows equal the one-shot batch IvfPqIndex.index() bit-for-bit —
    assignment and residual encoding are deterministic for a frozen
    fit, across batch splits AND full redelivery."""
    from bharatmlstack_spark.streaming.ingest import read_streamed_ivf_index

    idx, cands = _fit(spark)
    topic = str(tmp_path / "topic")
    index_path = str(tmp_path / "index")
    cands.select("vec_id", "embedding").repartition(3).write.parquet(topic)
    for ck in ("ck1", "ck2"):  # second pass = full redelivery
        _run_sink(spark, idx, topic, index_path, str(tmp_path / ck))

    def rows(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"])) for r in df.collect()
        )

    streamed = read_streamed_ivf_index(spark, index_path)
    assert rows(streamed) == rows(idx.index(cands))
    # redelivery really appended copies (the dedup is doing real work)
    assert (
        read_streamed_ivf_index(spark, index_path, dedup=False).count()
        == 2 * cands.count()
    )


def test_stale_codebooks_refused(spark, tmp_path):
    """Restart with different residual codebooks (same coarse centroids)
    must refuse — stale codebooks would encode new vectors against
    tables the accumulated codes don't mean."""
    idx, cands = _fit(spark)
    topic = str(tmp_path / "topic")
    index_path = str(tmp_path / "index")
    cands.select("vec_id", "embedding").coalesce(1).write.parquet(topic)
    _run_sink(spark, idx, topic, index_path, str(tmp_path / "ck1"))

    import copy

    stale = copy.deepcopy(idx)
    stale.codebooks = idx.codebooks + np.float32(0.25)
    with pytest.raises(Exception, match="residual codebooks"):
        _run_sink(spark, stale, topic, index_path, str(tmp_path / "ck2"))


def test_full_precision_root_refused(spark, tmp_path):
    """An IVF-PQ sink pointed at a root built by the full-precision IVF
    sink must refuse — tinyint-code rows would mix schemas."""
    from bharatmlstack_spark.operators.lsh import IvfIndex
    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_ann_ivf_sink,
    )

    idx, cands = _fit(spark)
    topic = str(tmp_path / "topic")
    index_path = str(tmp_path / "index")
    cands.select("vec_id", "embedding").coalesce(1).write.parquet(topic)
    ivf = IvfIndex(n_cells=8).fit(cands, sample_size=256, iters=3)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_ann_ivf_sink(
        stream, ivf, index_path, str(tmp_path / "ck1"), spark,
        trigger_once=True,
    )
    await_stream(q, 300, "ivf sink")
    with pytest.raises(Exception, match="full-precision"):
        _run_sink(spark, idx, topic, index_path, str(tmp_path / "ck2"))


def test_stream_ann_ivfpq_search_matches_duckdb_oracle(spark):
    """The driver's exact comparison on the STAGED (query, oracle) pair
    — the full stream -> sidecar-reload -> masked-read -> ADC -> re-rank
    lifecycle against the brute-force DuckDB twin."""
    from bharatmlstack_spark.queries_text import (
        STAGED_ORACLES,
        stream_ann_ivfpq_search,
    )

    out = stream_ann_ivfpq_search(spark, SF_DIR)
    cols = sorted(out.columns)
    got = sorted(tuple(r[c] for c in cols) for r in out.collect())
    assert len(got) == 10
    assert all(r[cols.index("recall_ok")] for r in got)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    rel = con.sql(STAGED_ORACLES["stream_ann_ivfpq_search"])
    assert sorted(rel.columns) == cols
    order = [rel.columns.index(c) for c in cols]
    ref = sorted(tuple(r[i] for i in order) for r in rel.fetchall())
    assert got == ref
