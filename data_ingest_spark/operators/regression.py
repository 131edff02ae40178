"""M4: genes-vs-UMIs regression with prediction band (SURVEY.md §2.8).

Reference: src/QC_helpers/numGenesVsNumUmis.r:51-112 — per sample, fit
MASS::rlm(log10(genes) ~ log10(molecules)), compute a prediction
interval at level 1-p.level (p.level = min(0.001, 1/ncells)), and mark
cells outside the band as outliers (removed via F11 anti-join).

Two implementations:

- :func:`ols_band` — closed-form least squares from the five classical
  sums, per sample, entirely as DataFrame aggregations. Exactly
  expressible in ANSI SQL, so it carries the DuckDB oracle row. The
  band multiplier is a fixed z (the reference's t-quantile converges to
  z for the cell counts involved).
- :func:`huber_rlm` — IRLS Huber fit per sample via ``applyInPandas``
  (the reference's actual estimator). Iterative ⇒ not SQL-expressible;
  covered by property tests. Each sample's (x, y) pairs fit in one
  Arrow batch at reference scale (≤ ~10^5 cells/sample); samples fit in
  parallel across executors.

Both consume a cells frame with ``nCount_RNA``/``nFeature_RNA`` (A1/A2)
and emit per-cell predictions + outlier flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)


def _xy(cells: DataFrame) -> DataFrame:
    return cells.select(
        "sample", "barcode",
        F.log10(F.col("nCount_RNA")).alias("x"),
        F.log10(F.col("nFeature_RNA")).alias("y"),
    )


def ols_band(cells: DataFrame, z: float = 3.0) -> DataFrame:
    """Per-sample OLS fit of log10(genes) ~ log10(molecules) with a
    ±z·RMSE prediction band. Returns (sample, barcode, x, y, pred,
    is_outlier). One aggregation shuffle + one broadcast join."""
    pts = _xy(cells)
    fit = pts.groupBy("sample").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).select(
        "sample", "n",
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
         ).alias("slope"),
        "sx", "sy", "sxx", "sxy", "syy",
    ).select(
        "sample", "n", "slope",
        ((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")
         ).alias("intercept"),
        F.sqrt(
            (F.col("syy")
             - F.col("slope") * F.col("sxy")
             - ((F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n"))
             * F.col("sy"))
            / (F.col("n") - F.lit(2.0))
        ).alias("rmse"),
    )
    return (
        pts.join(F.broadcast(fit), "sample")
        .withColumn("pred", F.col("intercept") + F.col("slope") * F.col("x"))
        .withColumn("is_outlier",
                    F.abs(F.col("y") - F.col("pred")) > F.lit(z) * F.col("rmse"))
        .select("sample", "barcode", "x", "y", "pred", "is_outlier")
    )


_RLM_SCHEMA = StructType([
    StructField("sample", StringType()),
    StructField("slope", DoubleType()),
    StructField("intercept", DoubleType()),
    StructField("scale", DoubleType()),
])


def huber_rlm_fit(cells: DataFrame, c: float = 1.345,
                  max_iter: int = 50, tol: float = 1e-8) -> DataFrame:
    """Per-sample Huber IRLS fit (MASS::rlm defaults: tuning c=1.345,
    MAD scale). Returns one row per sample (slope, intercept, scale)."""
    pts = _xy(cells)

    def fit(pdf):
        import numpy as np
        import pandas as pd
        x, y = pdf["x"].to_numpy(), pdf["y"].to_numpy()
        X = np.column_stack([np.ones_like(x), x])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        scale = 1.0
        for _ in range(max_iter):
            r = y - X @ beta
            scale = np.median(np.abs(r - np.median(r))) / 0.6745 or 1e-12
            u = r / (scale * c)
            w = np.where(np.abs(u) <= 1.0, 1.0, 1.0 / np.maximum(np.abs(u), 1e-12))
            Xw = X * w[:, None]
            beta_new = np.linalg.solve(X.T @ Xw, Xw.T @ y)
            if np.max(np.abs(beta_new - beta)) < tol:
                beta = beta_new
                break
            beta = beta_new
        return pd.DataFrame({
            "sample": [pdf["sample"].iloc[0]],
            "slope": [float(beta[1])],
            "intercept": [float(beta[0])],
            "scale": [float(scale)],
        })

    return pts.groupBy("sample").applyInPandas(fit, schema=_RLM_SCHEMA)


def huber_band_outliers(cells: DataFrame, z: float = 3.29) -> DataFrame:
    """Full M4: Huber fit per sample, flag cells outside ±z·scale of the
    prediction (z = Phi^-1(1 - 0.001/2) ≈ 3.29, the reference's default
    p.level=0.001 two-sided band). Returns (sample, barcode, pred,
    is_outlier) — feed the outliers to filters.remove_outliers (F11)."""
    pts = _xy(cells)
    fit = huber_rlm_fit(cells)
    return (
        pts.join(F.broadcast(fit), "sample")
        .withColumn("pred", F.col("intercept") + F.col("slope") * F.col("x"))
        .withColumn("is_outlier",
                    F.abs(F.col("y") - F.col("pred")) > F.lit(z) * F.col("scale"))
        .select("sample", "barcode", "x", "y", "pred", "is_outlier")
    )


def theil_sen(events: DataFrame, key_col: str = "user_id",
              ts_col: str = "ts", val_col: str = "value",
              seq_col: str = "event_id") -> DataFrame:
    """Per-key Theil–Sen robust trend: the median of all pairwise
    slopes (value per HOUR) over a key's event history — the classic
    29.3%-breakdown-point alternative to OLS when a user's metric
    series carries outliers (Sen 1968; the reference's rlm fit solves
    the same robustness problem for the gene/UMI fit, see
    src/QC_helpers/numGenesVsNumUmis.r:51-66 — this is the
    nonparametric sibling for event streams).

    Pairwise slopes are O(k²) per key — correct for the bounded
    per-entity histories this targets (sessions, accounts: k ≤ ~10³);
    the self-join keys the shuffle on ``key_col`` so every key's pairs
    build inside one partition, and keys scale out embarrassingly.
    Timestamps go through the repo's epoch_seconds (NTZ-safe, matches
    DuckDB's naive-as-UTC epoch()); one double division per pair, and the median is a positional pick (avg of the
    two middles) via one row_number window on the same key partition —
    no driver state anywhere.

    Returns ``(key, n_pairs, theil_slope)`` with slope in value-units
    per hour, rounded 6dp.
    """
    from data_ingest_spark.functions.stats import epoch_seconds
    e = events.select(
        F.col(key_col).alias("_k"), F.col(seq_col).alias("_i"),
        epoch_seconds(F.col(ts_col)).alias("_t"),
        F.col(val_col).cast("double").alias("_v"))
    a = e.select(F.col("_k"), F.col("_i").alias("_ia"),
                 F.col("_t").alias("_ta"), F.col("_v").alias("_va"))
    b = e.select(F.col("_k"), F.col("_i").alias("_ib"),
                 F.col("_t").alias("_tb"), F.col("_v").alias("_vb"))
    sl = (a.join(b, "_k")
          .filter((F.col("_ia") < F.col("_ib"))
                  & (F.col("_ta") != F.col("_tb")))
          .select("_k",
                  (((F.col("_vb") - F.col("_va")) * F.lit(3600.0))
                   / (F.col("_tb") - F.col("_ta")))
                  .alias("_sl")))
    from pyspark.sql import Window as W
    win = W.partitionBy("_k").orderBy("_sl")
    r = (sl.withColumn("_rn", F.row_number().over(win))
         .withColumn("_n", F.count("*").over(W.partitionBy("_k"))))
    mid = r.filter((F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
                   | (F.col("_rn") == F.floor(F.col("_n") / 2) + 1))
    return (mid.groupBy(F.col("_k").alias(key_col))
            .agg(F.max("_n").cast("long").alias("n_pairs"),
                 F.round(F.avg("_sl"), 6).alias("theil_slope")))
