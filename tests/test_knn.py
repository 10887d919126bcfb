"""VectorSearch: filter compiler (P6/P7), KNN (J6), scoring (J7/F17-F18)."""

import math

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.functions.vector import (
    cosine_similarity,
    dot,
    euclidean_distance,
    l2_normalize,
)
from bharatmlstack_spark.operators.knn import FilterSpec, VectorSearch, compile_filters


@pytest.fixture(scope="module")
def cands(spark):
    return spark.createDataFrame(
        [
            ("a", [1.0, 0.0], "x", 5),
            ("b", [0.0, 1.0], "x", 15),
            ("c", [1.0, 1.0], "y", 25),
            ("d", [-1.0, 0.0], "y", 35),
        ],
        ["candidate_id", "embedding", "brand", "size"],
    )


def test_vector_functions(spark):
    df = spark.createDataFrame([([3.0, 4.0], [1.0, 0.0])], ["a", "b"])
    r = df.select(
        dot("a", "b").alias("d"),
        cosine_similarity("a", "b").alias("c"),
        euclidean_distance("a", "b").alias("e"),
        l2_normalize("a").alias("n"),
    ).collect()[0]
    assert r["d"] == 3.0
    assert r["c"] == pytest.approx(3.0 / 5.0)
    assert r["e"] == pytest.approx(math.sqrt(4 + 16))
    assert r["n"] == pytest.approx([0.6, 0.8])


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 0.0])], ["a", "b"])
    assert df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"] is None


def test_knn_dot_topk(spark, cands):
    qs = spark.createDataFrame([(1, [1.0, 0.5])], ["query_id", "query_embedding"])
    vs = VectorSearch()
    out = vs.knn(cands, qs, k=2, metric="DOT").collect()
    assert [r["candidate_id"] for r in out] == ["c", "a"]  # 1.5, 1.0
    assert [r["rank"] for r in out] == [1, 2]


def test_knn_euclidean_ascending(spark, cands):
    qs = spark.createDataFrame([(1, [1.0, 0.0])], ["query_id", "query_embedding"])
    out = VectorSearch().knn(cands, qs, k=2, metric="EUCLIDEAN").collect()
    assert out[0]["candidate_id"] == "a"  # distance 0


def test_knn_with_filters(spark, cands):
    """P6+P7: per-query + global filters merged (qdrant.go:393-412)."""
    qs = spark.createDataFrame([(1, [1.0, 1.0])], ["query_id", "query_embedding"])
    out = VectorSearch().knn(
        cands,
        qs,
        k=10,
        metric="DOT",
        filters=[FilterSpec("brand", "IN", ["y"])],
        global_filters=[FilterSpec("size", "LTE", [30])],
    ).collect()
    assert [r["candidate_id"] for r in out] == ["c"]  # d excluded by size? no: d size 35


def test_filter_operators(spark, cands):
    def ids(pred):
        return sorted(r["candidate_id"] for r in cands.filter(pred).collect())

    assert ids(FilterSpec("brand", "IN", ["x"]).to_column()) == ["a", "b"]
    assert ids(FilterSpec("brand", "NIN", ["x"]).to_column()) == ["c", "d"]
    assert ids(FilterSpec("brand", "EX", []).to_column()) == ["a", "b", "c", "d"]
    assert ids(FilterSpec("size", "LT", [15]).to_column()) == ["a"]
    assert ids(FilterSpec("size", "LTE", [15]).to_column()) == ["a", "b"]
    assert ids(FilterSpec("size", "GT", [25]).to_column()) == ["d"]
    assert ids(FilterSpec("size", "GTE", [25]).to_column()) == ["c", "d"]
    assert ids(FilterSpec("size", "BTW", [5, 25]).to_column()) == ["b"]  # exclusive
    assert ids(FilterSpec("size", "BTWE", [5, 25]).to_column()) == ["a", "b", "c"]
    assert ids(FilterSpec("brand", "SEARCH", ["y"]).to_column()) == ["c", "d"]
    with pytest.raises(ValueError):
        FilterSpec("size", "BOGUS", []).to_column()


def test_last_x_days(spark):
    df = spark.createDataFrame(
        [("new", "2026-01-05"), ("old", "2025-01-01")], ["id", "d"]
    ).withColumn("listed_at", F.col("d").cast("timestamp"))
    pred = FilterSpec("listed_at", "LAST_X_DAYS", [30]).to_column(
        now=F.lit("2026-01-10").cast("timestamp")
    )
    assert [r["id"] for r in df.filter(pred).collect()] == ["new"]


def test_compile_filters_conjunction(spark, cands):
    pred = compile_filters(
        [FilterSpec("brand", "IN", ["x", "y"])],
        [FilterSpec("size", "GT", [10])],
    )
    assert sorted(r["candidate_id"] for r in cands.filter(pred).collect()) == [
        "b", "c", "d",
    ]
    assert compile_filters(None, None) is None


def test_score_ids(spark, cands):
    ids = spark.createDataFrame([("a",), ("d",)], ["candidate_id"])
    out = VectorSearch().score_ids(cands, ids, [2.0, 0.0]).orderBy("candidate_id").collect()
    assert [r["candidate_id"] for r in out] == ["a", "d"]
    assert [r["score"] for r in out] == [2.0, -2.0]


def test_get_embeddings(spark, cands):
    ids = spark.createDataFrame([("b",), ("zz",)], ["candidate_id"])
    out = VectorSearch().get_embeddings(cands, ids).collect()
    assert len(out) == 1 and out[0]["candidate_id"] == "b"


def test_knn_per_query_filters(spark, cands):
    """P7 per-query filters: each request carries its own predicate set;
    globals apply to every query (skye.proto:7-16)."""
    qs = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.0, 1.0]), (3, [1.0, 1.0])],
        ["query_id", "query_embedding"],
    )
    out = VectorSearch().knn_per_query(
        cands,
        qs,
        k=10,
        query_filters={
            1: [FilterSpec("brand", "IN", ["x"])],
            2: [FilterSpec("brand", "IN", ["y"])],
            # query 3 not listed -> only global filters apply
        },
        global_filters=[FilterSpec("size", "LTE", [30])],
        metric="DOT",
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["candidate_id"])
    assert sorted(by_q[1]) == ["a", "b"]  # brand x, size<=30
    assert by_q[2] == ["c"]  # brand y, size<=30 (d is 35)
    assert sorted(by_q[3]) == ["a", "b", "c"]  # globals only
