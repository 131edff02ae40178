"""Normalization / feature statistics (SURVEY.md §2.8 M5–M7).

  M5 LogNormalize   src/QC_helpers/dataIntegration.r:92,101
  M6 FindVariableFeatures (vst) src/QC_helpers/dataIntegration.r:93,102
  M7 ScaleData      src/QC_helpers/dataIntegration.r:106

M5 is one broadcast-joined map stage. M6/M7 compute zero-inclusive
moments from nonzero sums: with N total cells, mean = Σx/N and
var = (Σx² − (Σx)²/N)/(N−1) — the implicit zeros never materialize, so
the plan stays proportional to nnz, not genes×cells (the property that
makes this viable at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def log_normalize(expr: DataFrame, scale_factor: float = 1e4) -> DataFrame:
    """M5: log1p(count / cellTotal * scale_factor) per nonzero entry."""
    totals = expr.groupBy("sample", "barcode").agg(
        F.sum("count").alias("_cell_total"))
    return (
        expr.join(totals, ["sample", "barcode"])
        .withColumn(
            "normalized",
            F.log1p(F.col("count") / F.col("_cell_total") * F.lit(scale_factor)),
        )
        .drop("_cell_total")
    )


def gene_moments(expr: DataFrame, value_col: str = "count") -> DataFrame:
    """M6 (stats half): zero-inclusive per-gene mean and variance.
    N = number of distinct cells in the experiment (scalar broadcast)."""
    n_cells = expr.select("sample", "barcode").distinct().count()
    return (
        expr.groupBy("gene")
        .agg(
            F.sum(value_col).alias("_s"),
            F.sum(F.col(value_col) * F.col(value_col)).alias("_ss"),
        )
        .select(
            "gene",
            (F.col("_s") / F.lit(n_cells)).alias("mean"),
            (
                (F.col("_ss") - F.col("_s") * F.col("_s") / F.lit(n_cells))
                / F.lit(max(n_cells - 1, 1))
            ).alias("variance"),
        )
    )


def highly_variable_genes(expr: DataFrame, n_top: int = 2000,
                          value_col: str = "count") -> DataFrame:
    """M6 (selection half): rank genes by variance, keep top n_top.
    The reference standardizes variance with a loess fit of
    log10(var)~log10(mean) (vst); the loess residualization runs
    driver-side over ~30k gene points in ``pipeline.reduction`` — here
    the raw-variance ranking used for the oracle-checkable subset."""
    moments = gene_moments(expr, value_col)
    return moments.orderBy(F.desc("variance"), "gene").limit(n_top)


def scale_data(normalized: DataFrame, value_col: str = "normalized",
               clip_max: float = 10.0) -> DataFrame:
    """M7: per-gene z-score of normalized values over *all* cells
    (zero-inclusive moments), clipped at clip_max. Returns nonzero
    entries with a ``scaled`` column; the implicit-zero z-score is
    -mean/sd per gene (constant, attachable from the moments table)."""
    n_cells = normalized.select("sample", "barcode").distinct().count()
    stats = (
        normalized.groupBy("gene")
        .agg(F.sum(value_col).alias("_s"),
             F.sum(F.col(value_col) ** 2).alias("_ss"))
        .select(
            "gene",
            (F.col("_s") / F.lit(n_cells)).alias("_mu"),
            F.sqrt(
                (F.col("_ss") - F.col("_s") ** 2 / F.lit(n_cells))
                / F.lit(max(n_cells - 1, 1))
            ).alias("_sd"),
        )
    )
    return (
        normalized.join(F.broadcast(stats), "gene")
        .withColumn(
            "scaled",
            F.least(
                F.lit(clip_max),
                (F.col(value_col) - F.col("_mu")) / F.nullif(F.col("_sd"), F.lit(0.0)),
            ),
        )
        .drop("_mu", "_sd")
    )
