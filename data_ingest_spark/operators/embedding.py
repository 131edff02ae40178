"""M10/M11: 2-D embeddings of the reduced (PCA) space.

Reference: RunUMAP(dims=1:30, min.dist=0.3) and RunTSNE(perplexity=
min(30, n/100)) at /root/reference/src/QC_helpers/configureEmbedding.r:
73-100; both are inherently global iterative optimizations, driver-side
over the collected N×d reduced matrix (SURVEY §2.8 strategy [UDF]).

This container has neither umap-learn nor scikit-learn, so:
  - `embed_umap` / `embed_tsne` dispatch to the real libraries when
    importable (production path) and otherwise fall back to
    `spectral_embedding`, clearly reported in the `method` column.
  - `spectral_embedding` is a genuine deterministic 2-D embedding:
    the two smallest non-trivial eigenvectors of the symmetric
    normalized Laplacian of the kNN graph (numpy.linalg.eigh) — the
    same graph structure UMAP optimizes, without the stochastic
    refinement.

Only the reduced matrix (N × ≤50 doubles) crosses to the driver — the
documented ceiling of every embedding implementation, Seurat included.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

EMBEDDING_SCHEMA = StructType([
    StructField("sample", StringType()),
    StructField("barcode", StringType()),
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
    StructField("method", StringType()),
])


def _collect_matrix(pc_cols: DataFrame):
    rows = pc_cols.orderBy("sample", "barcode").collect()
    ids = [(r["sample"], r["barcode"]) for r in rows]
    feat_cols = [c for c in pc_cols.columns if c.startswith("pc_")]
    x = np.array([[r[c] for c in feat_cols] for r in rows], dtype=np.float64)
    return ids, x


def _knn_graph(x: np.ndarray, k: int) -> np.ndarray:
    n = x.shape[0]
    sq = (x ** 2).sum(axis=1)
    a = np.zeros((n, n))
    chunk = 2048
    k = min(k, n - 1)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d2 = sq[lo:hi, None] + sq[None, :] - 2.0 * x[lo:hi] @ x.T
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf
        nbr = np.argpartition(d2, k, axis=1)[:, :k]
        for i, row in enumerate(nbr):
            a[lo + i, row] = 1.0
    return np.maximum(a, a.T)  # symmetrize


def _spectral_2d(x: np.ndarray, k: int = 15) -> np.ndarray:
    a = _knn_graph(x, k)
    d = a.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    lap = np.eye(len(a)) - (d_inv_sqrt[:, None] * a * d_inv_sqrt[None, :])
    vals, vecs = np.linalg.eigh(lap)
    # columns 1 and 2: smallest non-trivial eigenvectors; fix sign for
    # determinism (largest-|component| entry made positive)
    out = vecs[:, 1:3].copy()
    for j in range(2):
        i = np.argmax(np.abs(out[:, j]))
        if out[i, j] < 0:
            out[:, j] = -out[:, j]
    return out


def spectral_embedding(pc_cols: DataFrame, k: int = 15) -> DataFrame:
    ids, x = _collect_matrix(pc_cols)
    emb = _spectral_2d(x, k)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "spectral")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def embed_umap(pc_cols: DataFrame, n_neighbors: int = 30,
               min_dist: float = 0.3, seed: int = 42) -> DataFrame:
    """UMAP when umap-learn is installed; spectral fallback otherwise."""
    try:
        import umap  # noqa: F401
    except ImportError:
        return spectral_embedding(pc_cols, k=n_neighbors)
    ids, x = _collect_matrix(pc_cols)
    emb = umap.UMAP(n_neighbors=min(n_neighbors, len(ids) - 1),
                    min_dist=min_dist, random_state=seed).fit_transform(x)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "umap")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def embed_tsne(pc_cols: DataFrame, seed: int = 42) -> DataFrame:
    """t-SNE with the reference's auto-params (perplexity=min(30,n/100),
    learning.rate=max(200,n/12), configureEmbedding.r:85-100) when
    sklearn is installed; spectral fallback otherwise."""
    try:
        from sklearn.manifold import TSNE  # noqa: F401
    except ImportError:
        return spectral_embedding(pc_cols, k=15)
    ids, x = _collect_matrix(pc_cols)
    n = len(ids)
    emb = TSNE(perplexity=min(30.0, max(2.0, n / 100.0)),
               learning_rate=max(200.0, n / 12.0),
               random_state=seed, init="pca").fit_transform(x)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "tsne")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)
