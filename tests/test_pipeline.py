"""Pipeline DAG (U2), feature/expression/scoring components, pair/slate
expansion (J5)."""

import pytest
from pyspark.sql import functions as F

from bharatmlstack_spark.functions.expressions import ExpressionEngine
from bharatmlstack_spark.pipeline import (
    ExpressionComponent,
    FeatureComponent,
    FnComponent,
    Pipeline,
    ScoringComponent,
    expand_pairs,
    expand_slates,
)


def test_pipeline_topological_order(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    pipe = (
        Pipeline()
        .add(FnComponent("a", lambda d: d.withColumn("y", F.col("x") + 1)))
        .add(FnComponent("b", lambda d: d.withColumn("z", F.col("y") * 2)), depends_on=["a"])
    )
    row = pipe.run(df).collect()[0]
    assert row["z"] == 4


def test_pipeline_rejects_unknown_dep_and_dup(spark):
    pipe = Pipeline().add(FnComponent("a", lambda d: d))
    with pytest.raises(ValueError, match="unknown dependency"):
        pipe.add(FnComponent("b", lambda d: d), depends_on=["zzz"])
    with pytest.raises(ValueError, match="duplicate"):
        pipe.add(FnComponent("a", lambda d: d))


def test_pipeline_cycle_detected(spark):
    """initializer.go:15-55 errors on cycles; graphlib raises CycleError."""
    from graphlib import CycleError

    pipe = Pipeline()
    pipe._components = {"a": FnComponent("a", lambda d: d), "b": FnComponent("b", lambda d: d)}
    pipe._deps = {"a": {"b"}, "b": {"a"}}
    with pytest.raises(CycleError):
        pipe.run(spark.createDataFrame([(1,)], ["x"]))


def test_feature_component_key_map(spark):
    """J4: feature-table key renamed to the matrix's column name."""
    matrix = spark.createDataFrame([(1, 10), (2, 20)], ["req", "uid"])
    feats = spark.createDataFrame([(10, 0.5)], ["user_id", "bal"])
    out = FeatureComponent("f", feats, key_map={"user_id": "uid"}).apply(matrix)
    rows = {r["req"]: r["bal"] for r in out.collect()}
    assert rows[1] == 0.5 and rows[2] is None


def test_expression_and_scoring_components(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], ["id", "a", "b"])
    eng = ExpressionEngine()
    eng.register("s", "a b *", output_column="ab")
    out = ExpressionComponent("e", eng, "s").apply(df)
    out = ScoringComponent("m", input_cols=["ab", "a"], weights=[1.0, 10.0]).apply(out)
    row = out.collect()[0]
    assert row["ab"] == 6.0 and row["model_score"] == 26.0


def test_scoring_component_custom_model(spark):
    import pandas as pd

    df = spark.createDataFrame([(1, 2.0)], ["id", "a"])
    out = ScoringComponent(
        "m", input_cols=["a"], model=lambda a: pd.Series(a * 3)
    ).apply(df)
    assert out.collect()[0]["model_score"] == 6.0


@pytest.fixture(scope="module")
def reqs(spark):
    return spark.createDataFrame(
        [
            (
                "r1",
                ["t0", "t1", "t2"],
                [{"first": 0, "second": 2}],
                [[0, 1], [1, 2]],
            )
        ],
        "request_id string, target_ids array<string>, "
        "pairs array<struct<first:int,second:int>>, slates array<array<int>>",
    )


def test_expand_pairs(reqs):
    rows = expand_pairs(reqs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["first_target"], r["second_target"]) == ("t0", "t2")
    assert r["pair_idx"] == 0


def test_expand_slates(reqs):
    rows = {r["slate_idx"]: r["slate_targets"] for r in expand_slates(reqs).collect()}
    assert rows[0] == ["t0", "t1"]
    assert rows[1] == ["t1", "t2"]  # order inside slate preserved


def test_pipeline_branched_dag(spark):
    """Non-linear DAG: two independent feature branches merge into one
    scoring node — the configured-graph case Kahn's algorithm exists for
    (executor.go:36-98); order respects dependencies, branches commute."""
    matrix = spark.createDataFrame([(1, 10, 100)], ["req", "uid", "pid"])
    user_feats = spark.createDataFrame([(10, 2.0)], ["user_id", "u_bal"])
    prod_feats = spark.createDataFrame([(100, 3.0)], ["product_id", "p_price"])
    pipe = (
        Pipeline()
        .add(FeatureComponent("users", user_feats, key_map={"user_id": "uid"}))
        .add(FeatureComponent("prods", prod_feats, key_map={"product_id": "pid"}))
        .add(
            ScoringComponent("score", input_cols=["u_bal", "p_price"], weights=[1.0, 10.0]),
            depends_on=["users", "prods"],
        )
    )
    row = pipe.run(matrix).collect()[0]
    assert row["model_score"] == 32.0
