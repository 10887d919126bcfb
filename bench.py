"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count + a cheap collect of the plan
output) so the measured time includes the full scan/shuffle, not just plan
construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.queries import all_queries

# headline set: one per operator family, heaviest variants
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "entity_resolution_join",
    "feature_retrieve",
    "events_merge_trim",
    "events_weekly_buckets",
    "last_write_wins",
    "rpn_score",
    "norm_min_max",
    "percentile_rank",
    "knn_dot",
    "ann_lsh_dot",
    "topk_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_stats",
    "doc_fingerprint",
    "corpus_mix_sample",
    "quantile_binning",
    "sequence_packing",
    "negative_sampling",
    "pq_ann_topk",
    "tfidf_top_terms",
    "doc_chunks",
    # round-3 additions (the r02 set above keeps its names/order so
    # BENCH_r03 stays comparable to BENCH_r02 on the shared set)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "asof_feature_join",
    "range_join_sessions",
    # round-5 additions (prior names/order unchanged for comparability)
    "pii_redact",
    "span_dedup_exact",
    "unigram_lm_quality",
    "shard_manifest",
    "bucketed_colocated_join",
    "corpus_filter_chain",
    "bpe_merge_step",
    # round-6 additions (prior names/order unchanged for comparability)
    "bpe_vocab_learn",
    "bpe_tokenize_apply",
    "multimodal_decode_png",
    "pagerank_copurchase",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark("bench")
    qs = all_queries()

    # warm the JVM + parquet footer cache with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        # per-query isolation: one broken query marks itself -1 instead of
        # discarding every timing already measured (round 3's bench crash
        # lost the whole artifact)
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — record and keep benching
            timings[name] = -1.0
            print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)

    # product-path variants of the exact-recall rows: time what ships
    # (index + probe + re-score), not the verification harness the
    # registered forms carry for the correctness gate
    from bharatmlstack_spark.bench_product import PRODUCT_QUERIES

    product: dict[str, float] = {}
    for name, fn in PRODUCT_QUERIES.items():
        # per-query isolation: one broken product path must not discard
        # the headline timings that already ran
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — record and keep benching
            product[name] = -1.0
            print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            continue
        product[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {product[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # separate key: product totals must not shift the headline
                # metric's comparability across rounds
                "product_queries": product,
                "product_total": round(sum(v for v in product.values() if v >= 0), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
