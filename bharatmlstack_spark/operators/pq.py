"""Product quantization (PQ) for embedding storage + ADC search — the
compression path for 100 TB embedding tables.

A dim-D float32 vector (4·D bytes) becomes m uint8 codes (m bytes): each
of m subspaces of D/m dims gets its own k-centroid codebook (fit on a
driver-side sample, like IvfIndex), and a vector stores only its nearest-
centroid index per subspace. At dim=64, m=16 that is 256 B -> 16 B = 16×
storage compression, which is the difference between an embedding table
that fits the cluster and one that doesn't. ADC alone ranks coarsely;
``search(rerank=...)`` adds the standard exact re-rank over a small ADC
shortlist, so the corpus-scale scan stays on the 16-byte codes.

Search is ADC (asymmetric distance computation, Jégou et al. 2011): the
query stays full-precision; per subspace a k-entry dot-product lookup
table against the codebook is computed ONCE per query (driver-side numpy,
m·k floats), then a candidate's approximate score is the sum of m table
lookups — an Arrow-batched numpy gather, no per-row Python.

Scale notes: fit = driver sample (k·m·(D/m) floats, trivial); encode =
map-side pandas_udf over the candidate scan, no shuffle; search = map-side
score + the same top-k window every KNN path here uses (k rows per query
reach the shuffle). Codebooks ship to executors as closure constants
(KBs). Reference parity: skye serves full-precision embeddings
(skye/internal/serving/handlers/embedding/); PQ is our engine extension,
with the same DOT metric contract as VectorSearch (skye/README.md:17).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _kmeans(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's: farthest-point init (first row, then
    repeatedly the point farthest from the chosen set), fixed iteration
    count. No randomness -> same codebook on every run/engine."""
    chosen = [0]
    d = ((x - x[0]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(x)):
        nxt = int(d.argmax())
        if d[nxt] == 0.0:
            break  # fewer distinct points than k
        chosen.append(nxt)
        d = np.minimum(d, ((x - x[nxt]) ** 2).sum(axis=1))
    cents = x[chosen].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
    return cents.astype(np.float32)


class PqIndex:
    def __init__(
        self,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        m: int = 16,
        k: int = 64,
        fit_iters: int = 10,
    ) -> None:
        self.id_col, self.emb_col = id_col, emb_col
        self.m, self.k, self.fit_iters = m, k, fit_iters
        self.codebooks: np.ndarray | None = None  # (m, k, sub_dim)

    def fit(self, df: DataFrame, sample_size: int = 2048) -> "PqIndex":
        """Codebooks from the first ``sample_size`` rows in id order
        (deterministic sample; at scale swap for a hash-sampled scan)."""
        rows = (
            df.select(self.id_col, self.emb_col)
            .orderBy(self.id_col)
            .limit(sample_size)
            .collect()
        )
        x = np.array([r[1] for r in rows], dtype=np.float32)
        dim = x.shape[1]
        if dim % self.m:
            raise ValueError(f"dim {dim} not divisible by m={self.m}")
        sub = dim // self.m
        self.codebooks = np.stack(
            [
                _kmeans(x[:, j * sub : (j + 1) * sub], self.k, self.fit_iters)
                for j in range(self.m)
            ]
        )
        return self

    def encode(self, df: DataFrame) -> DataFrame:
        """(id, codes ARRAY<TINYINT>[m]): nearest sub-centroid per
        subspace. Arrow-batched argmin over the (batch, k) distance
        matrix per subspace — map-side only."""
        assert self.codebooks is not None, "fit() first"
        books, m = self.codebooks, self.m
        sub = books.shape[2]

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<tinyint>")
        def _enc(embs: pd.Series) -> pd.Series:
            x = np.vstack(embs.to_numpy()).astype(np.float32)
            codes = np.empty((len(x), m), dtype=np.int8)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            return pd.Series(list(codes))

        return df.select(self.id_col, _enc(F.col(self.emb_col)).alias("codes"))

    def search(
        self,
        codes_df: DataFrame,
        query: np.ndarray,
        k: int,
        rerank: DataFrame | None = None,
        shortlist: int | None = None,
    ) -> DataFrame:
        """ADC top-k by approximate DOT: score = sum_j table[j, code_j],
        table = query-subvector x codebook dot products.

        With ``rerank`` (the full-precision embedding table), ADC only
        PRUNES: the top-``shortlist`` (default 5k) approximate hits are
        re-scored exactly against their stored vectors — the standard
        IVFPQ-style two-stage search. The full table contributes one
        semi-join on the (tiny, broadcast) shortlist; exact scoring
        touches ``shortlist`` rows, never the corpus."""
        assert self.codebooks is not None, "fit() first"
        books, m = self.codebooks, self.m
        sub = books.shape[2]
        q = np.asarray(query, dtype=np.float32)
        table = np.stack(
            [books[j] @ q[j * sub : (j + 1) * sub] for j in range(m)]
        )  # (m, k)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("float")
        def _adc(codes: pd.Series) -> pd.Series:
            c = np.vstack(codes.to_numpy()).astype(np.int64)  # (batch, m)
            return pd.Series(table[np.arange(m)[None, :], c].sum(axis=1))

        # top-N via orderBy+limit = TakeOrderedAndProject (per-partition
        # heaps, N rows to the driver-side merge) — NOT a global window,
        # which would funnel every candidate through one partition. The
        # rank window then runs on <= N rows only.
        n = k if rerank is None else max(shortlist or 5 * k, k)
        topn = (
            codes_df.withColumn("score", _adc(F.col("codes")))
            .orderBy(F.desc("score"), F.asc(self.id_col))
            .limit(n)
        )
        if rerank is not None:
            qcol = F.lit([float(v) for v in q])  # one array literal, not dim lit() py4j calls
            exact = F.aggregate(
                F.zip_with(
                    F.col(self.emb_col).cast("array<double>"),
                    qcol,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            topn = (
                rerank.select(self.id_col, self.emb_col)
                .join(F.broadcast(topn.select(self.id_col)), on=self.id_col)
                .withColumn("score", exact.cast("float"))
                .orderBy(F.desc("score"), F.asc(self.id_col))
                .limit(k)
            )
        w = Window.orderBy(F.desc("score"), F.asc(self.id_col))
        return topn.withColumn("rank", F.row_number().over(w)).select(
            self.id_col, "score", "rank"
        )
