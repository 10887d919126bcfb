"""10x scale experiment: replicate sf0.1 into a key-shifted ~sf1 dataset
under /tmp and time a representative query subset at both scales.

Copies are KEY-SHIFTED (every key column offset per replica; document
texts get a per-replica suffix token) so join fan-out, dedup group sizes,
and per-key state stay constant — the workload grows linearly in rows,
which is exactly the 100 TB question: does each plan's wall-clock grow
~linearly with input, or does something quadratic/skewed hide at small
scale?

    python tools/scale_experiment.py [out_dir] [--keep]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.queries import all_queries

COPIES = 10
# key shift per replica, far above any real key range in sf0.1
SHIFT = 10_000_000

# per-table key columns to shift (dims nation/region are copied once)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
UNKEYED = ["nation", "region"]

# representative subset: scan-, join-, window-, dedup-, and text-heavy
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "feature_retrieve",
    "events_merge_trim",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "unigram_lm_quality",
    "span_dedup_exact",
    "cohort_retention",
    "corpus_filter_chain",
    "topk_orders",
    "copurchase_pairs",
    "event_transition_matrix",
    "value_zscore_outliers",
    "zorder_cells",
    # round-6 additions: the iterative/tokenizer rows (multimodal_decode_png
    # is fixture-sized by construction, nothing to scale)
    "bpe_vocab_learn",
    "bpe_tokenize_apply",
    "pagerank_copurchase",
    # round-7 additions: the rewritten single-shingle-pass LSH pipeline and
    # the streaming CDC apply (topic replayed twice per run)
    "dedup_minhash_lsh",
    "stream_cdc_apply",
    # round-8 additions: the streaming near-dup sink (3-batch topic x 2
    # replays per run) and CDC tombstone GC (replay + compact + stale probe)
    "stream_dedup_minhash",
    "stream_cdc_gc",
    # round-8b: the packed-vote SimHash + banded hamming join family
    "dedup_simhash",
    # round-9 registrations (staged through r08): the registered
    # semantic_dedup_ivf derives n_cells ~ n/10^4 with a floor of 16,
    # which at these fixture sizes resolves to 16 — the explicit
    # (cells~n) row below is the parameterization demo at 16 -> 160
    "bm25_topk",
    "bigram_pmi",
    "char_entropy_quality",
    "semantic_dedup_ivf",
    # round-10 registrations: string-vector retrieve through a real
    # persisted bucketed table, and the streaming SemDeDup sink (3-file
    # topic x 2 replays per run, shared cell-partitioned index)
    "feature_retrieve_string_vector",
    "stream_semantic_dedup_sink",
    # round-11 registration: cross-corpus MinHash-LSH decontamination —
    # incoming-corpus size scales with documents (every 25th doc x 2),
    # reference corpus = the full table; candidates must stay ∝ the
    # incoming side's collisions, never A x B
    "dedup_cross_corpus",
]


def build(spark, src: str, out: str) -> None:
    for t in UNKEYED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, keys in KEYED.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if t == "documents":
                # texts must differ per replica or dedup groups grow 10x
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                )
            parts.append(c)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionAll(p)
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def _semdedup_prescribed(n_cells: int):
    """SemDeDup at its PRESCRIBED parameterization (n_cells ~ n/10^4,
    per the operator docstring): cells scale WITH the corpus so per-cell
    size — and the within-cell pair count per vector — stays constant.
    The staged row times the fixed-16-cell form (a recall fixture); this
    row is the 100 TB costing, like raising table buckets with volume."""

    def run(spark, sf_dir: str):
        from bharatmlstack_spark.operators.dedup import (
            embedding_semantic_dedup_pairs,
        )

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        return embedding_semantic_dedup_pairs(
            e, id_col="vec_id", threshold=0.99, n_cells=n_cells
        )

    return run


def _stream_semdedup_prescribed(n_cells: int):
    """The streaming SemDeDup sink at the PRESCRIBED cell count — the
    same 3-file-topic x 2-replay shape as the registered row, but with
    cells scaling with the corpus (16 -> 160 at 10x) instead of the
    registered derivation whose floor binds at fixture sizes. Within-cell
    pair work per vector stays constant; the registered floor-bound form
    is the cautionary sibling, exactly like the batch pair above."""

    def run(spark, sf_dir: str):
        import tempfile

        from bharatmlstack_spark.operators.lsh import IvfIndex
        from bharatmlstack_spark.streaming.ingest import (
            await_stream,
            stream_semantic_dedup_sink,
        )
        from pyspark.sql import functions as FF

        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        dup = e.filter(FF.col("vec_id") % 50 == 0).select(
            (FF.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
        corpus_e = e.unionAll(dup)
        idx = IvfIndex(n_cells=n_cells, id_col="vec_id").fit(
            corpus_e, sample_size=512, iters=3
        )
        work = tempfile.mkdtemp(prefix="bmls_semstream_scale_")
        corpus_e.repartition(3).write.parquet(f"{work}/topic")
        schema = "vec_id bigint, embedding array<float>"
        for replay in ("ckpt1", "ckpt2"):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{work}/topic")
            )
            q = stream_semantic_dedup_sink(
                stream, idx, f"{work}/index", f"{work}/pairs",
                f"{work}/{replay}", spark, threshold=0.99, trigger_once=True,
            )
            await_stream(
                q, 600, f"stream_semantic_dedup_sink (replay {replay})"
            )
        out = (
            spark.read.parquet(f"{work}/pairs")
            .dropDuplicates(["id_a", "id_b"])
            .filter(FF.round("cosine", 6) >= 0.99)
        )
        import atexit
        import shutil

        atexit.register(lambda w=work: shutil.rmtree(w, ignore_errors=True))
        return out

    return run


def time_queries(spark, sf_dir: str, scaled: bool = False) -> dict[str, float]:
    qs = all_queries()
    todo = [(n, qs[n]) for n in QUERIES]
    # parameter scales with the data (16 cells at sf0.1, 160 at sf1)
    todo.append(
        ("semantic_dedup_ivf (cells~n)", _semdedup_prescribed(160 if scaled else 16))
    )
    todo.append(
        (
            "stream_semantic_dedup_sink (cells~n)",
            _stream_semdedup_prescribed(160 if scaled else 16),
        )
    )
    out = {}
    for name, fn in todo:
        t0 = time.time()
        fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bmls_sf1"
    keep = "--keep" in sys.argv
    src = "/root/testdata/sf0.1"
    spark = get_spark("scale-experiment")
    print("building 10x dataset...", file=sys.stderr)
    t0 = time.time()
    build(spark, src, out_dir)
    print(f"built in {time.time()-t0:.1f}s", file=sys.stderr)
    small = time_queries(spark, src)
    big = time_queries(spark, out_dir, scaled=True)
    ratios = {k: round(big[k] / small[k], 2) for k in small}
    print(json.dumps({"sf0.1": small, "sf1": big, "ratio": ratios}, indent=2))
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
