"""End-to-end demo: corpus -> trained BPE tokenizer -> encoded documents.

The tokenizer workflow this engine runs entirely as Spark plans — the
same operators the correctness gate verifies row-by-row:

  1. corpus vocabulary statistics (heavy hitters, no full shuffle)
  2. BPE training: 3 corpus-wide merge rounds over the distinct-word table
  3. the learned merges + final vocabulary
  4. tokenizer inference: encode every document via a broadcast lookup
  5. compression report (chars -> tokens)

    python examples/tokenizer_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bharatmlstack_spark import get_spark
from bharatmlstack_spark.operators.profile import heavy_hitters
from bharatmlstack_spark.queries_text import _BPE_BARE, _bpe_learn_words


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer-demo")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    doc_words = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$") & (F.length("w") >= 2))

    # 1. what dominates the corpus? (two-pass: bounded candidates + exact)
    print("== 1. heavy hitters (>=3.5% of tokens) ==")
    heavy_hitters(doc_words, "w", 7, 200).orderBy(F.desc("cnt")).show()

    # 2-3. train BPE: 3 merge rounds over the DISTINCT-word table
    words, merges = _bpe_learn_words(spark, sf_dir)
    print("== 2. learned merges ==")
    for m in merges:
        m.show()

    print("== 3. final vocabulary (top 10 by weighted count) ==")
    (
        words.select(F.explode(F.expr(_BPE_BARE)).alias("token"), "n")
        .groupBy("token")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .show(10)
    )

    # 4. inference: broadcast word -> token-count lookup onto the corpus
    lookup = words.select("w", F.expr(f"size({_BPE_BARE})").alias("n_tokens"))
    encoded = (
        doc_words.join(F.broadcast(lookup), on="w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.length("w")).alias("n_chars"),
        )
    )

    # 5. corpus-wide compression from the merges
    tot = encoded.agg(
        F.sum("n_chars").alias("chars"), F.sum("n_tokens").alias("tokens")
    ).head()
    print(
        f"== 5. encoded corpus: {tot.chars} chars -> {tot.tokens} tokens "
        f"({tot.chars / tot.tokens:.3f} chars/token) =="
    )
    print("done.")


if __name__ == "__main__":
    main()
