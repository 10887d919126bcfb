"""End-to-end demo: what a BharatMLStack user's workflow looks like on this
engine.

The reference workflow (README.md quick-start + the py-sdk notebook
`push_features_to_online_feature_store.ipynb`):
  1. register an entity + feature groups (horizon)
  2. compute features offline in Spark and push them (py-sdk)
  3. serve point lookups with defaults/TTL/quantization (ONFS)
  4. score with a numerix expression + a model (inferflow)
  5. find similar candidates (skye)

Same five steps here, all in one Spark session:

    python examples/feature_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.registry import (
    DataType,
    Entity,
    Feature,
    FeatureGroup,
    SchemaRegistry,
)
from bharatmlstack_spark.operators.feature_store import FeatureStore
from bharatmlstack_spark.operators.knn import VectorSearch
from bharatmlstack_spark.pipeline import (
    ExpressionComponent,
    FeatureComponent,
    Pipeline,
    ScoringComponent,
)
from bharatmlstack_spark.functions.expressions import ExpressionEngine
from bharatmlstack_spark.streaming.ingest import await_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("feature-pipeline-demo")

    # 1. register the entity (the horizon control-plane step)
    registry = SchemaRegistry()
    registry.register(
        Entity(
            label="user",
            key_columns=["user_id"],
            feature_groups={
                "orders": FeatureGroup(
                    "orders", 1, DataType.INT64,
                    {1: [Feature("n_orders", 0, default=0)]}, ttl_seconds=86400,
                ),
                "spend": FeatureGroup(
                    "spend", 2, DataType.FP64,
                    {1: [Feature("total", 0, default=0.0), Feature("total_k", 1, default=0.0)]}, ttl_seconds=86400,
                ),
            },
        )
    )

    workdir = tempfile.mkdtemp(prefix="bmls_demo_")
    fs = FeatureStore(spark, registry, workdir)

    # 2. offline feature computation + materialization (the py-sdk push)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feats = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.count(F.lit(1)).alias("orders__n_orders"),
        F.sum("o_totalprice").alias("spend__total"),
        (F.sum("o_totalprice") / 1000.0).alias("spend__total_k"),
    )
    fs.materialize("user", feats)
    print(f"materialized {fs.load('user').count()} user feature rows -> {workdir}")

    # 3. serving-style retrieve: defaults for misses, quantized projection
    keys = spark.createDataFrame([(1,), (2,), (99_999_999,)], ["user_id"])
    out = fs.retrieve(
        "user",
        # total_k fits fp16 range; quantizing raw totals (>65504) would
        # round-trip to Infinity — exactly what the narrow format does
        {"orders": ["n_orders"], "spend": ["total", "total_k@DataTypeFP16"]},
        keys,
    )
    print("point lookups (note default-filled miss + fp16-quantized spend):")
    out.show()

    # 4. inferflow-style scoring DAG: features -> numerix RPN -> model stub
    eng = ExpressionEngine()
    eng.register("value_score", "spend__total 0.001 * orders__n_orders +",
                 output_column="score")
    requests = spark.createDataFrame([(1, 1), (2, 2)], ["request_id", "uid"])
    pipe = (
        Pipeline()
        .add(FeatureComponent("fetch", fs.load("user"),
                              key_map={"user_id": "uid"},
                              feature_cols=["orders__n_orders", "spend__total"]))
        .add(ExpressionComponent("numerix", eng, "value_score"), depends_on=["fetch"])
        .add(ScoringComponent("model", input_cols=["score"], weights=[0.5]),
             depends_on=["numerix"])
    )
    print("inference DAG output:")
    pipe.run(requests).show()

    # 5. similarity search over the embeddings collection (skye)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    knn = VectorSearch(id_col="vec_id").knn(emb, queries, k=3, metric="COSINE")
    print("top-3 similar candidates per query:")
    knn.show()

    # 6. table lifecycle: right-to-be-forgotten delete (bucket-scoped,
    # untouched bucket dirs never rewritten) then a serving read showing
    # the forgotten user as defaults
    removed = fs.delete(
        "user", spark.createDataFrame([(1,)], ["user_id"])
    )
    post = fs.retrieve("user", {"orders": ["n_orders"]}, keys)
    print(f"lifecycle: deleted {removed} key(s); user 1 now serves defaults:")
    post.orderBy("user_id").show()

    # 7. streaming CDC: replay a sequence-numbered change log onto a
    # bucket-partitioned state via foreachBatch — idempotent under
    # redelivery (seq guard), deletes survive as tombstones until the
    # committed watermark passes them (compact_cdc_state)
    from bharatmlstack_spark.streaming.ingest import (
        compact_cdc_state,
        seed_cdc_state,
        stream_cdc_sink,
    )

    cdc_dir = tempfile.mkdtemp(prefix="bmls_demo_cdc_")
    snap = spark.createDataFrame(
        [(i, i * 100) for i in range(1, 6)], "user_id long, spend long"
    )
    seed_cdc_state(snap, f"{cdc_dir}/state", key_cols=["user_id"], n_buckets=4)
    spark.createDataFrame(
        [(2, 10, "U", 999), (4, 11, "D", 0), (9, 12, "U", 555)],
        "user_id long, seq long, op string, spend long",
    ).coalesce(1).write.parquet(f"{cdc_dir}/topic")
    stream = spark.readStream.schema(
        "user_id long, seq long, op string, spend long"
    ).parquet(f"{cdc_dir}/topic")
    q = stream_cdc_sink(
        stream, f"{cdc_dir}/state", f"{cdc_dir}/ckpt", spark,
        key_cols=["user_id"], trigger_once=True,
    )
    await_stream(q, 120)
    gc = compact_cdc_state(spark, f"{cdc_dir}/state", watermark_seq=12)
    print(f"streaming CDC applied (update/delete/insert), {gc} tombstone(s) GC'd:")
    spark.read.parquet(f"{cdc_dir}/state").filter(
        F.col("__op") != "D"
    ).select("user_id", "spend").orderBy("user_id").show()
    import shutil as _sh

    _sh.rmtree(cdc_dir, ignore_errors=True)
    _sh.rmtree(workdir, ignore_errors=True)
    print("done.")


if __name__ == "__main__":
    main()
