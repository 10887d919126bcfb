"""Measure the gen-mask's flat-cost claim on the versioned streamed
postings index: search latency vs number of PENDING update waves.

The claim (SCALE.md, versioned postings): masking superseded
generations is ONE broadcast anti-join built from the tombstone
side-table, so search cost should be flat in the NUMBER of unfolded
update waves (it grows only with tombstone ROWS, which the fold
reclaims on cadence). This script builds one index per wave count —
full corpus as batch 0, then W waves each re-publishing ~9% of docs,
nothing folded — and times the SAME masked BM25 search (median of 5
draws after one warm draw) against each.

Run: python tools/mask_waves_experiment.py [sf_dir]
(defaults to /root/testdata/sf0.1 — 5,000 docs; SCALE.md numbers come
from that)
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_index(spark, docs, work: str, n_waves: int) -> str:
    from pyspark.sql import functions as F

    from bharatmlstack_spark.streaming.ingest import (
        await_stream,
        stream_postings_sink,
    )

    topic = os.path.join(work, f"topic_{n_waves}")
    index_path = os.path.join(work, f"index_{n_waves}")
    base, seen = 1_600_000_000, set()

    def _pin(i: int) -> None:
        for f in sorted(os.listdir(topic)):
            if f.endswith(".parquet") and f not in seen:
                os.utime(os.path.join(topic, f), (base + i * 60,) * 2)
                seen.add(f)

    docs.coalesce(1).write.parquet(topic)
    _pin(0)
    for i in range(1, n_waves + 1):
        docs.filter(F.col("doc_id") % 11 == (i % 11)).coalesce(1).write.mode(
            "append"
        ).parquet(topic)
        _pin(i)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(topic)
    )
    q = stream_postings_sink(
        stream, index_path, os.path.join(work, f"ck_{n_waves}"), spark,
        n_buckets=16, trigger_once=True, allow_updates=True,
    )
    await_stream(q, 1800, f"postings sink ({n_waves} waves)")
    return index_path


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    from bharatmlstack_spark.queries_text import _BM25_TERMS
    from bharatmlstack_spark.streaming.ingest import bm25_search_streamed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    work = tempfile.mkdtemp(prefix="bmls_maskwaves_")
    rows = []
    baseline = None
    for n_waves in (0, 1, 2, 4, 8):
        index_path = build_index(spark, docs, work, n_waves)
        tomb_dir = os.path.join(index_path, "tombstones")
        n_tomb = (
            spark.read.parquet(tomb_dir).count()
            if os.path.isdir(tomb_dir)
            else 0
        )
        draws = []
        for d in range(6):
            t0 = time.time()
            out = bm25_search_streamed(spark, index_path, _BM25_TERMS, k=10)
            got = [(r["doc_id"], round(r["score"], 9)) for r in out.collect()]
            draws.append(time.time() - t0)
            if d == 0:
                if baseline is None:
                    baseline = sorted(got)
                else:
                    # re-published text is identical, so the masked
                    # result must be wave-count-invariant
                    assert sorted(got) == baseline, (n_waves, got)
        med = statistics.median(draws[1:])  # drop the warm-up draw
        rows.append((n_waves, n_tomb, med))
    print(f"\nsf_dir={sf_dir}  docs={docs.count()}\n")
    print("| pending update waves | tombstone rows | masked search median s |")
    print("|---|---|---|")
    for n_waves, n_tomb, med in rows:
        print(f"| {n_waves} | {n_tomb} | {med:.2f} |")
    flat = rows[-1][2] / max(rows[0][2], 1e-9)
    print(f"\n8-wave vs 0-wave search-cost ratio: {flat:.2f}x")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
