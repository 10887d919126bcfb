"""Measure the streamed postings index at the regime that motivates its
reset job: a corpus that has OUTGROWN its term-bucket count.

`bm25_search_streamed` reads only the query terms' bucket dirs, so its
wall-clock scales with PER-BUCKET size, not index size. With n_buckets
frozen at creation (the layout contract), per-bucket size grows linearly
with the corpus — a 10x corpus makes every search pay ~10x. This tool
measures that growth and the recovery `rebucket_postings_index` buys:

1. SEED an N-doc postings state directly with the same derivations the
   sink writes (per-doc Zipfian term bags -> (term, id, tf, dl) rows
   under term_bucket dirs; doclen under id_bucket dirs; the sidecar the
   sink maintains) — seeding through the sink itself would just
   re-measure the bootstrap batches.
2. Time the 4-term search (median of 3) at N docs / B buckets, then at
   10N docs with the SAME frozen B buckets (the growth the due policy
   detects), then after `rebucket_postings_index` to 10B (per-bucket
   population back at target). Result equality is asserted through the
   migration.
3. Time the corpus-stats half separately: the post-compaction cached
   sidecar stats vs the doclen scan fallback, on the 10N index.

    python tools/postings_state_experiment.py [--docs N] [--words W]
        [--buckets B] [--keep]

Defaults: 100k docs x 60 words, 64 buckets -> the 10x corpus is 1M docs
(~35M postings rows), the "frozen layout outgrown ~10x" shape scaled to
local[32].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.streaming.ingest import (
    DOCLEN_DIR,
    MAINT_COUNTER_KEY,
    MAINT_ROWS_KEY,
    POSTINGS_DIR,
    POSTINGS_TOKENIZER,
    bm25_search_streamed,
    compact_streamed_postings,
    rebucket_postings_due,
    rebucket_postings_index,
)

VOCAB = 20_000
TERMS = ["t17", "t430", "t2900", "t11000"]  # spread across the Zipf curve


def seed_index(spark, index_path: str, n_docs: int, words: int, n_buckets: int):
    """Write the exact state the sink would have accumulated for n_docs
    documents of `words` Zipfian tokens each (alpha~2.2 via pow(rand,
    2.2): a few hot terms, a long tail — the postings skew that makes
    bucket sizing interesting)."""
    from bharatmlstack_spark.operators.feature_store import (
        TABLE_META_FILE,
        hadoop_write_text_atomic,
    )

    docs = spark.range(n_docs).select(F.col("id").alias("doc"))
    # deterministic per-(doc, slot) draw: u in [0,1) from xxhash64, then
    # u^2.2 Zipf-skews it (a few hot terms, a long tail)
    def draw(i):
        u = (
            F.pmod(F.xxhash64(F.col("doc"), i), F.lit(1_000_000_007)).cast(
                "double"
            )
            / 1_000_000_007.0
        )
        return F.concat(
            F.lit("t"), F.floor(F.pow(u, F.lit(2.2)) * VOCAB).cast("long")
        )

    toks = docs.select(
        "doc",
        F.explode(
            F.transform(F.sequence(F.lit(1), F.lit(words)), draw)
        ).alias("term"),
    )
    postings = (
        toks.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .select(
            "term",
            F.col("doc").alias("id"),
            "tf",
            F.lit(words).cast("long").alias("dl"),
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("term_bucket"),
        )
    )
    (
        postings.repartition("term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_path}/{POSTINGS_DIR}")
    )
    (
        docs.select(
            F.col("doc").alias("id"),
            F.lit(words).cast("long").alias("dl"),
            F.pmod(F.xxhash64(F.col("doc")), F.lit(n_buckets)).alias("id_bucket"),
        )
        .repartition("id_bucket")
        .write.mode("overwrite")
        .partitionBy("id_bucket")
        .parquet(f"{index_path}/{DOCLEN_DIR}")
    )
    n_post = spark.read.parquet(f"{index_path}/{POSTINGS_DIR}").count()
    hadoop_write_text_atomic(
        spark,
        os.path.join(index_path, TABLE_META_FILE),
        json.dumps(
            {
                "n_buckets": n_buckets,
                "tokenizer": POSTINGS_TOKENIZER,
                "id_col": "doc",
                MAINT_COUNTER_KEY: 1,  # "appends happened": scan-stats path
                MAINT_ROWS_KEY: n_post,
            }
        ),
    )
    return n_post


def timed_search(spark, index_path: str, reps: int = 3):
    walls, rows = [], None
    for _ in range(reps):
        t0 = time.time()
        got = bm25_search_streamed(
            spark, index_path, TERMS, k=10, dedup=False, persist_postings=False
        ).collect()
        walls.append(time.time() - t0)
        rows = sorted((r[0], r["rank"], round(r["score"], 6)) for r in got)
    return sorted(walls)[len(walls) // 2], rows


def scanned_rows(spark, index_path: str) -> int:
    """Postings rows the search's pruned read scans (pre term-filter) —
    the per-bucket-population metric wall-clock hides behind local[32]
    scheduling overhead at these sizes: it grows linearly with the
    corpus under a frozen bucket count and shrinks back ~new/old after a
    rebucket. This IS the cost that matters at 100 TB."""
    from bharatmlstack_spark.operators.feature_store import read_table_meta

    n_buckets = int(read_table_meta(spark, index_path)["n_buckets"])
    tdf = spark.createDataFrame([(t,) for t in TERMS], "term string")
    buckets = sorted(
        r[0]
        for r in tdf.select(
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b")
        ).distinct().collect()
    )
    root = f"{index_path}/{POSTINGS_DIR}"
    dirs = [
        d
        for b in buckets
        if os.path.isdir(d := f"{root.removeprefix('file:')}/term_bucket={b}")
    ]
    if not dirs:
        return 0
    return spark.read.option("basePath", root).parquet(*dirs).count()


def main() -> None:
    args = sys.argv[1:]

    def opt(name, default):
        return int(args[args.index(name) + 1]) if name in args else default

    n_docs = opt("--docs", 100_000)
    words = opt("--words", 60)
    buckets = opt("--buckets", 64)
    keep = "--keep" in args

    spark = get_spark("postings-scale")
    work = tempfile.mkdtemp(prefix="postings_exp_")
    out = {"docs": n_docs, "words": words, "buckets": buckets}
    try:
        small = f"{work}/small"
        n_post = seed_index(spark, small, n_docs, words, buckets)
        w_small, _ = timed_search(spark, small)
        out["small"] = {
            "postings": n_post,
            "search_s": round(w_small, 2),
            "scanned": scanned_rows(spark, small),
        }
        print(json.dumps({"phase": "small", **out["small"]}))

        big = f"{work}/big"
        n_post10 = seed_index(spark, big, 10 * n_docs, words, buckets)
        w_frozen, rows_frozen = timed_search(spark, big)
        out["big_frozen"] = {
            "postings": n_post10,
            "search_s": round(w_frozen, 2),
            "scanned": scanned_rows(spark, big),
        }
        print(json.dumps({"phase": "big_frozen", **out["big_frozen"]}))

        assert rebucket_postings_due(
            spark, big, target_bucket_rows=n_post // buckets
        )  # per-bucket target = the small index's healthy population
        t0 = time.time()
        stats = rebucket_postings_index(spark, big, 10 * buckets)
        rebucket_s = time.time() - t0
        w_rebucket, rows_rebucket = timed_search(spark, big)
        assert rows_rebucket == rows_frozen  # identical through migration
        out["big_rebucketed"] = {
            "new_buckets": stats["new_buckets"],
            "rebucket_s": round(rebucket_s, 2),
            "search_s": round(w_rebucket, 2),
            "scanned": scanned_rows(spark, big),
        }
        print(json.dumps({"phase": "big_rebucketed", **out["big_rebucketed"]}))

        # stats half: cached sidecar vs doclen scan, on the big index.
        # rebucket_postings_index left a FRESH cache (counter==0), so the
        # scan leg must be forced: pop the cache keys and mark an append
        # (counter=1) — exactly the state a post-append search sees.
        from bharatmlstack_spark.operators.feature_store import (
            TABLE_META_FILE,
            hadoop_write_text_atomic,
            read_table_meta,
        )

        meta = read_table_meta(spark, big)
        scan_meta = {
            k: v for k, v in meta.items() if k not in ("n_docs", "sum_dl")
        }
        scan_meta[MAINT_COUNTER_KEY] = 1
        hadoop_write_text_atomic(
            spark, os.path.join(big, TABLE_META_FILE), json.dumps(scan_meta)
        )
        w_scan, rows_scan = timed_search(spark, big)
        assert rows_scan == rows_frozen
        compact_streamed_postings(spark, big)  # no-op rewrite; re-caches
        assert "n_docs" in read_table_meta(spark, big)
        w_cached, rows_cached = timed_search(spark, big)
        assert rows_cached == rows_frozen
        out["stats"] = {
            "scan_search_s": round(w_scan, 2),
            "cached_search_s": round(w_cached, 2),
        }
        print(json.dumps({"phase": "stats", **out["stats"]}))

        out["growth_frozen_x"] = round(w_frozen / w_small, 2)
        out["growth_rebucketed_x"] = round(w_rebucket / w_small, 2)
        out["scanned_frozen_x"] = round(
            out["big_frozen"]["scanned"] / out["small"]["scanned"], 2
        )
        out["scanned_rebucketed_x"] = round(
            out["big_rebucketed"]["scanned"] / out["small"]["scanned"], 2
        )
        print(json.dumps(out))
    finally:
        if not keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
