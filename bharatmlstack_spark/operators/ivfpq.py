"""IVF-PQ: product-quantized codes inside IVF cells — the composed ANN
shape that actually ships at 100 TB (Jégou et al. 2011, the FAISS
``IVFx,PQy`` index), built from this repo's two existing halves:
``IvfIndex`` (coarse cells, operators/lsh.py) and the PQ machinery
(operators/pq.py).

Why the composition matters at scale: IVF alone prunes WHICH rows a
query reads (nprobe cells) but stores full-precision vectors — a 100 TB
embedding table stays 100 TB. PQ alone compresses 16× but every query
still scans ALL codes. IVF-PQ does both: the table shrinks to
``m`` bytes + 1 cell id per vector, and a query touches only the probed
cells' codes. The classic refinement is encoding RESIDUALS
(x − centroid(cell)) rather than raw vectors: residuals concentrate near
0 with far less variance than the raw corpus, so the same codebook
budget quantizes them with much lower error — and the approximate dot
product decomposes exactly as

    dot(x, q) ≈ dot(centroid_cell, q) + Σ_j books[j][code_j] · q_j

one driver-side (n_cells) vector plus one (m, k) lookup table per
query; a candidate's score is a numpy gather, no per-row Python.

Scale shape: fit = the same deterministic driver-side sample both
halves already use; index = ONE map-side Arrow batch per partition
(assign cell, subtract centroid, argmin per subspace — no shuffle);
search = partition-prunable cell filter → ADC gather → heap top-N
(TakeOrderedAndProject) → broadcast-semi-join exact re-rank over the
shortlist only. The corpus-scale scan touches ``m``-byte codes in
``nprobe``/``n_cells`` of the data, never raw vectors.

Reference parity: skye serves full-precision vectors from Qdrant
(skye/internal/repositories/vector/qdrant.go); IVF-PQ is our engine
extension with the same DOT metric contract as VectorSearch, composing
the reference-anchored IVF cell layout with the PQ storage path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bharatmlstack_spark.operators.lsh import IvfIndex
from bharatmlstack_spark.operators.pq import _kmeans


class IvfPqIndex:
    """Coarse IVF cells + per-cell residual PQ codes.

    ``n_cells`` coarse centroids (IvfIndex's deterministic fit), then
    ``m`` subspace codebooks of ``k`` centroids each, fit on RESIDUALS
    of the same deterministic sample. Storage per vector: 1 int cell +
    ``m`` uint8 codes (dim=64, m=16: 256 B → ~20 B)."""

    def __init__(
        self,
        n_cells: int = 16,
        m: int = 16,
        k: int = 64,
        fit_iters: int = 10,
        seed: int = 42,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> None:
        if k > 128:
            # codes are stored array<tinyint>; code ids 128..255 would
            # silently wrap negative and _adc would gather from the wrong
            # end of the distance table
            raise ValueError(
                f"k={k} exceeds tinyint code range (max 128); "
                "use k<=128 or widen code storage"
            )
        self.n_cells, self.m, self.k = n_cells, m, k
        self.fit_iters, self.seed = fit_iters, seed
        self.id_col, self.emb_col = id_col, emb_col
        self.ivf = IvfIndex(
            n_cells=n_cells, seed=seed, id_col=id_col, emb_col=emb_col
        )
        self.codebooks: np.ndarray | None = None  # (m, k, sub_dim)

    def fit(
        self,
        df: DataFrame,
        sample_size: int = 4096,
        ivf_iters: int = 5,
    ) -> "IvfPqIndex":
        """Two-stage deterministic fit on ONE driver-side sample: the
        coarse centroids first (IvfIndex.fit — hash-thresholded,
        order-pinned sample), then the PQ codebooks on that sample's
        residuals against its assigned centroids (the IVFADC recipe:
        codebooks model what the coarse quantizer leaves behind)."""
        self.ivf.fit(df, sample_size=sample_size, iters=ivf_iters)
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        # literally the same sample IvfIndex.fit trained on — retained by
        # fit (including its hash-threshold thinning and small-input
        # fallback), so the residual codebooks model exactly what the
        # coarse quantizer leaves behind on its own training set
        x = np.asarray(self.ivf._fit_sample, dtype=np.float64)
        dim = x.shape[1]
        if dim % self.m:
            raise ValueError(f"dim {dim} not divisible by m={self.m}")
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        resid = (x - cents[d.argmin(axis=1)]).astype(np.float32)
        sub = dim // self.m
        self.codebooks = np.stack(
            [
                _kmeans(resid[:, j * sub : (j + 1) * sub], self.k, self.fit_iters)
                for j in range(self.m)
            ]
        )
        return self

    def index(self, df: DataFrame) -> DataFrame:
        """(id, cell INT, codes ARRAY<TINYINT>[m]) — ONE Arrow-batched
        map-side pass: nearest-centroid cell (euclidean, ties to the
        lowest cell id, matching IvfIndex.index), residual against that
        centroid, per-subspace argmin against the residual codebooks.
        No shuffle; write ``.partitionBy("cell")`` for partition-pruned
        probes (the streamed-IVF layout)."""
        assert self.codebooks is not None, "fit() first"
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        c_sq = (cents**2).sum(1)
        books, m = self.codebooks, self.m
        sub = books.shape[2]

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("struct<cell: int, codes: array<tinyint>>")
        def _assign_encode(embs: pd.Series) -> pd.DataFrame:
            if embs.empty:
                return pd.DataFrame({"cell": [], "codes": []})
            x = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in embs]
            )
            d = (x**2).sum(1)[:, None] - 2.0 * (x @ cents.T) + c_sq[None, :]
            cell = d.argmin(axis=1)  # argmin ties → lowest index
            resid = (x - cents[cell]).astype(np.float32)
            codes = np.empty((len(x), m), dtype=np.int8)
            for j in range(m):
                rs = resid[:, j * sub : (j + 1) * sub]
                dj = ((rs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = dj.argmin(axis=1)
            return pd.DataFrame(
                {"cell": cell.astype(np.int32), "codes": list(codes)}
            )

        out = df.select(
            self.id_col, _assign_encode(F.col(self.emb_col)).alias("__ac")
        )
        return out.select(
            self.id_col,
            F.col("__ac.cell").alias("cell"),
            F.col("__ac.codes").alias("codes"),
        )

    def search(
        self,
        codes_df: DataFrame,
        query: np.ndarray,
        k: int,
        nprobe: int = 4,
        rerank: DataFrame | None = None,
        shortlist: int | None = None,
    ) -> DataFrame:
        """Approximate-DOT top-k through the probed cells' codes.

        Driver-side per query: ``cdot`` (n_cells dots — the coarse term)
        and the (m, k) residual ADC table; probe cells are the nprobe
        EUCLIDEAN-nearest centroids (the assignment metric, matching
        IvfIndex.search — ties to the lowest cell id). Candidate score =
        cdot[cell] + Σ_j table[j, code_j], one numpy gather per Arrow
        batch over only the probed cells' rows (``isin`` filter —
        partition-pruned when the codes table is written by cell).

        With ``rerank`` (the full-precision table), ADC only PRUNES: the
        top-``shortlist`` approximate hits re-score exactly via one
        broadcast semi-join — PqIndex.search's two-stage contract, so
        exact-equality oracles remain possible whenever (nprobe,
        shortlist) cover the true top-k."""
        assert self.codebooks is not None, "fit() first"
        books, m = self.codebooks, self.m
        sub = books.shape[2]
        q = np.asarray(query, dtype=np.float64)
        cents = np.asarray(self.ivf.centroids, dtype=np.float64)
        cdot = cents @ q  # (n_cells,) coarse term
        table = np.stack(
            [
                books[j].astype(np.float64) @ q[j * sub : (j + 1) * sub]
                for j in range(m)
            ]
        )  # (m, k) residual term
        cdist = ((cents - q[None, :]) ** 2).sum(1)
        probe = np.argsort(cdist, kind="stable")[: min(nprobe, len(cents))]

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _adc(cell: pd.Series, codes: pd.Series) -> pd.Series:
            if codes.empty:
                return pd.Series([], dtype=np.float64)
            c = np.vstack(codes.to_numpy()).astype(np.int64)
            cells = cell.to_numpy().astype(np.int64)
            return pd.Series(
                cdot[cells] + table[np.arange(m)[None, :], c].sum(axis=1)
            )

        cands = codes_df.filter(
            F.col("cell").isin([int(c) for c in probe])
        )
        n = k if rerank is None else max(shortlist or 5 * k, k)
        topn = (
            cands.withColumn("score", _adc(F.col("cell"), F.col("codes")))
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
                .withColumn("score", exact)
                .orderBy(F.desc("score"), F.asc(self.id_col))
                .limit(k)
            )
        w = Window.orderBy(F.desc("score"), F.asc(self.id_col))
        return topn.withColumn("rank", F.row_number().over(w)).select(
            self.id_col, "score", "rank"
        )
