"""IVF-PQ storage/latency/recall experiment — measured evidence for the
SCALE.md claims (the scale_experiment.py recipe applied to the vector
family): the sf embeddings table is replicated K times with a
deterministic per-replica element roll (norm-preserving, spreads the
corpus across cells), then exact brute-force top-10, bare IVF, and
IVF-PQ answer the same queries.

    python tools/ivfpq_experiment.py [sf_dir] [replicas] [n_queries]

Reports per index: wall seconds (median of 3), recall@10 vs exact, and
bytes per vector (raw float32 vs cell+codes).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("ivfpq-experiment")

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base.count()
    dim = len(base.head().embedding)
    # replica r: ids shift by r*n_base, embeddings roll by r%dim elements
    # (deterministic, norm-preserving — rolled clusters land elsewhere)
    reps = []
    for r in range(replicas):
        k = r % dim
        rolled = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice("embedding", k + 1, dim - k),
                F.slice("embedding", 1, k),
            )
        )
        reps.append(
            base.select(
                (F.col("vec_id") + r * n_base).alias("vec_id"),
                rolled.alias("embedding"),
            )
        )
    corpus = reps[0]
    for r in reps[1:]:
        corpus = corpus.unionAll(r)
    corpus = corpus.repartition(32).persist()
    n = corpus.count()
    print(f"# corpus: {n} vectors x {dim} dims "
          f"({replicas} rolled replicas of {n_base})")

    qrows = base.filter(F.col("vec_id") < n_queries).collect()
    queries = [(int(r.vec_id), np.array(r.embedding, dtype=np.float64))
               for r in qrows]

    # exact ground truth + brute-force timing (per query, median of 3)
    from bharatmlstack_spark.functions.vector import dot
    from pyspark.sql import Window

    def brute(q):
        qcol = F.array(*[F.lit(float(v)) for v in q])
        w = Window.orderBy(F.desc("score"), F.asc("vec_id"))
        return (
            corpus.withColumn("score", dot(F.col("embedding"), qcol))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("vec_id")
        )

    truth = {}
    brute_times = []
    for qid, q in queries:
        t0 = time.perf_counter()
        truth[qid] = {r.vec_id for r in brute(q).collect()}
        brute_times.append(time.perf_counter() - t0)

    from bharatmlstack_spark.operators.ivfpq import IvfPqIndex
    from bharatmlstack_spark.operators.lsh import IvfIndex

    n_cells = 64
    results = {}

    ivf = IvfIndex(n_cells=n_cells).fit(corpus, sample_size=4096, iters=5)
    indexed = ivf.index(corpus).persist()
    indexed.count()
    for nprobe in (8, 16, 32):
        times, hits = [], 0
        for qid, q in queries:
            qdf = spark.createDataFrame(
                [(qid, [float(v) for v in q])],
                "query_id long, query_embedding array<double>",
            )
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in ivf.search(
                    indexed, qdf, k=10, nprobe=nprobe, metric="DOT"
                ).collect()
            }
            times.append(time.perf_counter() - t0)
            hits += len(got & truth[qid])
        results[f"ivf (nprobe={nprobe}/64)"] = (
            statistics.median(times), hits / (10 * len(queries)), dim * 4
        )
    indexed.unpersist()

    ivfpq = IvfPqIndex(n_cells=n_cells, m=16, k=64).fit(
        corpus, sample_size=4096
    )
    codes = ivfpq.index(corpus).persist()
    codes.count()
    for nprobe in (8, 16, 32):
        times, hits = [], 0
        for qid, q in queries:
            t0 = time.perf_counter()
            got = {
                r.vec_id
                for r in ivfpq.search(
                    codes, q, k=10, nprobe=nprobe, rerank=corpus,
                    shortlist=100,
                ).collect()
            }
            times.append(time.perf_counter() - t0)
            hits += len(got & truth[qid])
        results[f"ivfpq (nprobe={nprobe}/64, m=16, sl=100)"] = (
            statistics.median(times), hits / (10 * len(queries)), 16 + 4
        )
    codes.unpersist()

    print(f"# brute force: median {statistics.median(brute_times):.3f}s, "
          f"recall 1.000, {dim * 4} B/vec")
    for name, (sec, recall, bpv) in results.items():
        print(f"# {name}: median {sec:.3f}s, recall {recall:.3f}, "
              f"{bpv} B/vec")


if __name__ == "__main__":
    main()
