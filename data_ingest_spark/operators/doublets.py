"""M2: doublet detection (scDblFinder-style), per-sample.

Reference: /root/reference/src/2-2_Compute-metrics_doublets.r:31-38 —
scDblFinder(counts) per sample after the min-10-features pre-filter,
emitting (barcode, doublet_scores ∈ [0,1], doublet_class).

Native re-derivation (same mechanism, simplified classifier):
simulate artificial doublets as sums of random cell pairs, featurize
every real cell and artificial doublet as (log1p total, log1p
n_features), score each real cell by the fraction of artificial
doublets among its k nearest neighbors in that feature space.
scDblFinder does exactly this with a richer feature space (PCA) and a
boosted classifier; the neighborhood-vote core is the same.

Spark shape: samples are independent ⇒ `applyInPandas` grouped by
sample (the reference's sequential loop becomes partition
parallelism). Within a group the kernel is vectorized numpy; memory is
O(cells·features) per sample, the same envelope scDblFinder needs.
Seeded, so deterministic."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, StringType, StructField, StructType)


def _out_schema(expr: DataFrame) -> StructType:
    """(sample, barcode) keep the INPUT's types (barcodes are long ids
    in the harness tables, strings in 10x data); scores/class appended."""
    fields = [expr.schema["sample"], expr.schema["barcode"]]
    return StructType([
        StructField("sample", fields[0].dataType),
        StructField("barcode", fields[1].dataType),
        StructField("doublet_scores", DoubleType()),
        StructField("doublet_class", StringType()),
    ])


def _score_sample(pdf: pd.DataFrame, n_sim_ratio: float, k: int,
                  threshold: float, seed: int) -> pd.DataFrame:
    # cell × feature matrix from the long counts
    piv = pdf.pivot_table(index="barcode", columns="gene", values="count",
                          aggfunc="sum", fill_value=0)
    barcodes = piv.index.to_numpy()
    x = piv.to_numpy(dtype=np.float64)
    n = len(barcodes)
    rng = np.random.default_rng(seed)
    n_sim = max(k + 1, int(n * n_sim_ratio))
    ia = rng.integers(0, n, n_sim)
    ib = rng.integers(0, n, n_sim)
    sim = x[ia] + x[ib]

    def feats(m):
        tot = m.sum(axis=1)
        nf = (m > 0).sum(axis=1)
        return np.column_stack([np.log1p(tot), np.log1p(nf)])

    real_f, sim_f = feats(x), feats(sim)
    allf = np.vstack([real_f, sim_f])
    # standardize so both axes weigh equally
    mu, sd = allf.mean(axis=0), allf.std(axis=0) + 1e-12
    real_f, sim_f = (real_f - mu) / sd, (sim_f - mu) / sd
    allf = np.vstack([real_f, sim_f])
    is_sim = np.concatenate([np.zeros(n), np.ones(len(sim_f))])

    # kNN vote: fraction of artificial doublets among k nearest.
    # Chunked |a|²+|b|²−2a·bᵀ keeps memory at O(chunk × candidates)
    # instead of materializing the full n × 2n distance tensor.
    kk = min(k, allf.shape[0] - 1)
    all_sq = (allf ** 2).sum(axis=1)
    scores = np.empty(n)
    chunk = 1024
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = real_f[lo:hi]
        d2 = ((block ** 2).sum(axis=1)[:, None] + all_sq[None, :]
              - 2.0 * block @ allf.T)
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf  # self
        nbr = np.argpartition(d2, kk, axis=1)[:, :kk]
        scores[lo:hi] = is_sim[nbr].mean(axis=1)

    return pd.DataFrame({
        "sample": pdf["sample"].iloc[0],
        "barcode": barcodes,
        "doublet_scores": scores,
        "doublet_class": np.where(scores > threshold, "doublet", "singlet"),
    })


def doublet_scores(expr: DataFrame, n_sim_ratio: float = 1.0, k: int = 20,
                   threshold: float = 0.25, seed: int = 42) -> DataFrame:
    """(sample, barcode, doublet_scores, doublet_class) — one
    applyInPandas group per sample."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_sample(pdf, n_sim_ratio, k, threshold, seed)

    return expr.groupBy("sample").applyInPandas(fn, _out_schema(expr))
