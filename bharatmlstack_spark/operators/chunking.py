"""Document chunking + sequence packing — the ops that turn a cleaned
corpus into fixed-budget training sequences.

Both are deliberately expressed so a SQL oracle can replay them exactly:

- ``chunk_documents``: overlapping word windows. Pure per-row array ops
  (sequence/transform/slice + posexplode) — map-side, scales with scan
  bandwidth, no shuffle.

- ``pack_sequences``: greedy CONTIGUOUS packing — docs ordered by id
  within a hash shard, running token cumsum, bin = floor(cumsum_before /
  budget). One window per shard (the shuffle), deterministic given the
  data. Sharding is what makes this scale: the window partitions by
  ``doc_id % n_shards``, so no single executor ever sees the whole
  corpus, and adding shards is a parameter change. (First-fit-decreasing
  would pack ~1-2% tighter but is inherently sequential — wrong trade at
  100 TB.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split each doc into word windows of ``window`` words every
    ``stride`` words (overlap = window - stride). Output: (id, chunk_idx,
    chunk_text, n_words). Short docs yield exactly one chunk."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(ws)
    # chunks 0..ceil(max(n-window,0)/stride); last chunk may be short
    n_extra = F.ceil(F.greatest(n - window, F.lit(0)).cast("double") / stride).cast("int")
    idx = F.sequence(F.lit(0), n_extra)
    chunks = F.transform(idx, lambda i: F.array_join(F.slice(ws, i * stride + 1, window), " "))
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.withColumn(
        "n_words", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each doc to a (shard, bin) training sequence by its starting
    offset in the shard's id-ordered token stream: bin = floor(offset /
    budget). A doc that straddles a budget boundary stays in the bin it
    starts in, so a bin can overflow by at most one doc's length — chunk
    long docs first (chunk_documents) when hard caps matter. Output adds
    shard, bin, tokens_before (the doc's offset inside its shard
    stream)."""
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(F.col(id_col).asc())
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("shard", shard)
        .withColumn("__cum", cum)
        .select(
            F.col(id_col),
            "shard",
            F.floor((F.col("__cum") - F.col(token_col)) / budget).cast("bigint").alias("bin"),
            (F.col("__cum") - F.col(token_col)).alias("tokens_before"),
        )
    )
