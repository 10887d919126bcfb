"""Vector deletion in the streamed IVF index — the postings tombstone
discipline (tests/test_stream_bm25.py) applied to the vector family:
immediate masking through read_streamed_ivf_index, physical purge folded
into compact_streamed_index, refit over the shrunk corpus."""

import os

import pytest

from pyspark.sql import functions as F

from bharatmlstack_spark.operators.lsh import IvfIndex
from bharatmlstack_spark.streaming.ingest import (
    IVF_TOMBSTONES_DIR,
    compact_streamed_index,
    delete_indexed_vectors,
    fold_index_tombstones,
    read_streamed_ivf_index,
    refit_streamed_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def built(spark, tmp_path):
    """A small streamed-index state: the embeddings corpus assigned by a
    frozen quantizer, appended TWICE (full redelivery)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ivf = IvfIndex(n_cells=4, id_col="vec_id").fit(e, sample_size=256, iters=2)
    index_path = str(tmp_path / "index")
    assigned = ivf.index(e)
    for _ in range(2):
        assigned.write.mode("append").partitionBy("cell").parquet(index_path)
    return index_path, ivf, e


def _top1_ids(ivf, index, queries):
    out = ivf.search(index, queries, k=1, nprobe=4, metric="COSINE")
    return {r["query_id"]: r["vec_id"] for r in out.collect()}


def test_deleted_vectors_leave_search_immediately(spark, built):
    """Query each deleted vector BY ITSELF: pre-delete the top-1 is the
    self-match (cosine 1.0); post-delete the self id cannot appear in
    any top-k, and the result equals the search over the physically
    filtered corpus."""
    index_path, ivf, e = built
    victims = [r["vec_id"] for r in e.limit(3).collect()]
    queries = e.filter(F.col("vec_id").isin(victims)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    index = read_streamed_ivf_index(spark, index_path)
    assert _top1_ids(ivf, index, queries) == {v: v for v in victims}

    assert delete_indexed_vectors(spark, index_path, victims) == 3
    masked = read_streamed_ivf_index(spark, index_path)
    got = _top1_ids(ivf, masked, queries)
    assert all(got[v] != v for v in victims)
    # equality with the search over the filtered corpus, same quantizer
    ref_index = ivf.index(e.filter(~F.col("vec_id").isin(victims)))
    assert got == _top1_ids(ivf, ref_index, queries)


def test_compact_folds_vector_tombstones(spark, built):
    """compact_streamed_index purges tombstoned rows physically (both
    redelivery copies), removes the tombstone table, and still reclaims
    the remaining redelivery duplicates."""
    index_path, ivf, e = built
    victims = [r["vec_id"] for r in e.limit(2).collect()]
    delete_indexed_vectors(spark, index_path, victims)
    n_total = e.count()
    removed = compact_streamed_index(spark, index_path)
    assert removed == n_total - 2  # redelivery copies of the SURVIVORS
    assert not os.path.exists(f"{index_path}/{IVF_TOMBSTONES_DIR}")
    left = spark.read.parquet(index_path)
    assert left.filter(F.col("vec_id").isin(victims)).count() == 0
    assert left.count() == n_total - 2


def test_fold_drops_fully_emptied_cell_dir(spark, tmp_path):
    """Deleting every vector of a cell empties its dir — the purge must
    drop it explicitly (dynamic overwrite leaves absent partitions)."""
    spark_df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    ivf = IvfIndex(n_cells=2, id_col="vec_id").fit(
        spark_df, sample_size=4, iters=3
    )
    index_path = str(tmp_path / "idx")
    assigned = ivf.index(spark_df)
    assigned.write.mode("append").partitionBy("cell").parquet(index_path)
    # victims: every vector of one cell
    cells = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    target_cell = cells[1]
    victims = [v for v, c in cells.items() if c == target_cell]
    delete_indexed_vectors(spark, index_path, victims)
    stats = fold_index_tombstones(spark, index_path)
    assert stats["rows_removed"] == len(victims)
    assert not os.path.exists(f"{index_path}/cell={target_cell}")
    left = read_streamed_ivf_index(spark, index_path)
    assert {r["vec_id"] for r in left.collect()} == set(cells) - set(victims)


def test_refit_after_delete_excludes_victims(spark, built):
    """refit_streamed_index folds pending tombstones first: the re-fit
    sample, re-assignment, and sidecar totals see the shrunk corpus."""
    index_path, ivf, e = built
    victims = [r["vec_id"] for r in e.limit(2).collect()]
    delete_indexed_vectors(spark, index_path, victims)
    stats = refit_streamed_index(
        spark, index_path, target_cell_rows=64, min_cells=2
    )
    assert stats["n"] == e.count() - 2
    assert not os.path.exists(f"{index_path}/{IVF_TOMBSTONES_DIR}")
    left = spark.read.parquet(index_path)
    assert left.filter(F.col("vec_id").isin(victims)).count() == 0
