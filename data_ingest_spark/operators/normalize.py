"""Normalization / feature statistics (SURVEY.md §2.8 M5–M7).

  M5 LogNormalize   src/QC_helpers/dataIntegration.r:92,101
  M6 FindVariableFeatures (vst) src/QC_helpers/dataIntegration.r:93,102
  M7 ScaleData      src/QC_helpers/dataIntegration.r:106

M5 is one join + map stage. M6/M7 compute zero-inclusive moments from
nonzero sums: with N total cells, mean = Σx/N and
var = (Σx² − (Σx)²/N)/(N−1) — the implicit zeros never materialize, so
the plan stays proportional to nnz, not genes×cells (the property that
makes this viable at 100 TB).

The cell count N enters as a 1-row broadcast cross-join (lazy, fused
into the same job) — never a driver-side ``.count()``, so composing
``scale_data(log_normalize(expr))`` stays a single Spark job with no
extra full-table passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def n_cells_df(expr: DataFrame) -> DataFrame:
    """1-row DataFrame with the number of distinct (sample, barcode)
    cells — broadcast-cross-joined wherever a scalar N is needed so the
    plan stays lazy."""
    return (
        expr.select("sample", "barcode").distinct()
        .agg(F.count("*").cast("double").alias("_n_cells"))
    )


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


def gene_moments(expr: DataFrame, value_col: str = "count",
                 n_cells: int | None = None) -> DataFrame:
    """M6 (stats half): zero-inclusive per-gene mean and variance.
    N = number of distinct cells; pass it if already known (saves the
    1-row subplan), else it is derived lazily in the same job."""
    agg = expr.groupBy("gene").agg(
        F.sum(value_col).alias("_s"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("_ss"),
    )
    if n_cells is not None:
        agg = agg.withColumn("_n_cells", F.lit(float(n_cells)))
    else:
        agg = agg.crossJoin(F.broadcast(n_cells_df(expr)))
    return agg.select(
        "gene",
        (F.col("_s") / F.col("_n_cells")).alias("mean"),
        (
            (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n_cells"))
            / (F.col("_n_cells") - F.lit(1.0))
        ).alias("variance"),
    )


def highly_variable_genes(expr: DataFrame, n_top: int = 2000,
                          value_col: str = "count",
                          n_cells: int | None = None) -> DataFrame:
    """M6 (selection half, oracle-checkable subset): rank genes by raw
    variance, keep top n_top (ties broken by gene id — deterministic).
    The reference's full vst standardization (loess) is
    :func:`vst_standardized_variance` — kept separate because the
    loess fit is not SQL-expressible, so this variant carries the
    DuckDB oracle."""
    moments = gene_moments(expr, value_col, n_cells)
    return moments.orderBy(F.desc("variance"), "gene").limit(n_top)


def vst_standardized_variance(expr: DataFrame, value_col: str = "count",
                              span: float = 0.3,
                              n_cells: int | None = None) -> DataFrame:
    """M6, full Seurat FindVariableFeatures(vst) semantics
    (src/QC_helpers/dataIntegration.r:93,102):

    1. zero-inclusive per-gene mean/variance,
    2. loess(log10(var) ~ log10(mean), span=0.3, degree=2) over genes
       with var > 0 → expected sd per gene,
    3. standardized variance = variance of (x − μ)/σ_expected with
       values clipped ABOVE at √N (zeros included analytically:
       the N − nnz implicit entries each contribute (−μ/σ)², never
       clipped since it is negative).

    Scale split: the loess runs driver-side over the per-gene moments
    (~10⁴–10⁵ rows — independent of cell count), its predictions
    rejoin as a broadcast table, and the standardized pass is one
    groupBy(gene) over nonzeros. Eager at the moments boundary (one
    aggregation job), distributed everywhere data is large.

    Returns (gene, mean, variance, sd_exp, std_variance).
    """
    import numpy as np

    from data_ingest_spark.functions.loess import loess_fit

    if n_cells is None:
        n_cells = int(n_cells_df(expr).collect()[0][0])
    clip = float(n_cells) ** 0.5

    mom = gene_moments(expr, value_col, n_cells).toPandas()
    pos = mom[mom["variance"] > 0.0]
    if len(pos) > 0:
        fitted = loess_fit(np.log10(pos["mean"].to_numpy()),
                           np.log10(pos["variance"].to_numpy()), span=span)
        pos = pos.assign(sd_exp=np.sqrt(np.power(10.0, fitted)))
    else:
        pos = pos.assign(sd_exp=np.zeros(0))
    # Explicit schema: createDataFrame cannot infer from an empty
    # pandas frame (empty input / all-zero-variance genes).
    gene_type = dict(expr.dtypes)["gene"]
    fit_df = expr.sparkSession.createDataFrame(
        pos[["gene", "mean", "variance", "sd_exp"]],
        schema=(f"gene {gene_type}, mean double, variance double, "
                "sd_exp double"))

    z = F.least(F.lit(clip),
                (F.col(value_col) - F.col("mean")) / F.col("sd_exp"))
    per_gene = (
        expr.join(F.broadcast(fit_df), "gene")
        .groupBy("gene")
        .agg(F.sum(z * z).alias("_s_nz"),
             F.count("*").alias("_nnz"),
             F.first("mean").alias("mean"),
             F.first("variance").alias("variance"),
             F.first("sd_exp").alias("sd_exp"))
    )
    n = F.lit(float(n_cells))
    z0g = (F.lit(0.0) - F.col("mean")) / F.col("sd_exp")
    return per_gene.select(
        "gene", "mean", "variance", "sd_exp",
        ((F.col("_s_nz") + (n - F.col("_nnz")) * z0g * z0g)
         / (n - F.lit(1.0))).alias("std_variance"),
    )


def vst_quadfit_variance(expr: DataFrame, value_col: str = "count",
                         n_cells: int | None = None) -> DataFrame:
    """M6 variant with an oracle-exact smoother: global quadratic OLS
    of log10(variance) ~ log10(mean) in place of the loess
    (src/QC_helpers/dataIntegration.r:93,102 — same standardization
    contract, different expected-sd curve).

    Where :func:`vst_standardized_variance` fits loess driver-side
    (not SQL-expressible → rows-only driver check), this variant's
    smoother is closed-form: center x at its mean, accumulate the
    power sums S2..S4 / Sy..Su2y with one aggregation, solve the 3×3
    normal equations by Cramer's rule inside the plan. Every step is
    a built-in aggregate, so DuckDB can replay it exactly and the
    driver can hash-check values. Fully distributed: no collect, the
    1-row fit broadcast-joins back to the per-gene moments.

    Standardization is identical to the loess variant: clip z above
    at √N, add the (N − nnz) implicit-zero contributions analytically,
    divide by N − 1. Returns (gene, mean, variance, sd_exp,
    std_variance) for genes with variance > 0.
    """
    if n_cells is not None:
        mom = gene_moments(expr, value_col, n_cells)
        n_lit = float(n_cells)
        mom = mom.withColumn("_n", F.lit(n_lit))
    else:
        mom = gene_moments(expr, value_col).crossJoin(
            F.broadcast(n_cells_df(expr)))
        mom = mom.withColumnRenamed("_n_cells", "_n")
    # pos is consumed three times (x-mean, power sums, prediction
    # join); persist the per-GENE frame (rows = genes, independent of
    # cell count — bounded at any corpus scale) so the expression-table
    # aggregation underneath runs once, not three times.
    pos = (mom.filter(F.col("variance") > 0.0)
              .withColumn("_x", F.log10("mean"))
              .withColumn("_y", F.log10("variance"))).persist()
    xm = pos.agg(F.avg("_x").alias("_xm"))
    pu = (pos.crossJoin(F.broadcast(xm))
             .withColumn("_u", F.col("_x") - F.col("_xm")))
    # Powers written as explicit products (u*u, not POWER(u, 2)) so
    # Spark and DuckDB evaluate bit-identical expressions.
    u = F.col("_u")
    sums = pu.agg(
        F.count("*").cast("double").alias("s0"),
        F.sum(u).alias("s1"),
        F.sum(u * u).alias("s2"),
        F.sum(u * u * u).alias("s3"),
        F.sum(u * u * u * u).alias("s4"),
        F.sum("_y").alias("sy"),
        F.sum(u * F.col("_y")).alias("suy"),
        F.sum(u * u * F.col("_y")).alias("su2y"),
    )
    s0, s1, s2 = F.col("s0"), F.col("s1"), F.col("s2")
    s3, s4 = F.col("s3"), F.col("s4")
    sy, suy, su2y = F.col("sy"), F.col("suy"), F.col("su2y")
    det = (s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s2 * s3)
           + s2 * (s1 * s3 - s2 * s2))
    b0 = (sy * (s2 * s4 - s3 * s3) - s1 * (suy * s4 - su2y * s3)
          + s2 * (suy * s3 - su2y * s2)) / det
    b1 = (s0 * (suy * s4 - su2y * s3) - sy * (s1 * s4 - s2 * s3)
          + s2 * (s1 * su2y - s2 * suy)) / det
    b2 = (s0 * (s2 * su2y - s3 * suy) - s1 * (s1 * su2y - s3 * sy)
          + sy * (s1 * s3 - s2 * s2)) / det
    fit = sums.select(b0.alias("_b0"), b1.alias("_b1"), b2.alias("_b2"))

    pred = (F.col("_b0") + F.col("_b1") * F.col("_u")
            + F.col("_b2") * F.col("_u") * F.col("_u"))
    fit_df = (pu.crossJoin(F.broadcast(fit))
                .withColumn("sd_exp", F.sqrt(F.pow(F.lit(10.0), pred)))
                .select("gene", "mean", "variance", "sd_exp", "_n"))

    z = F.least(F.sqrt(F.col("_n")),
                (F.col(value_col) - F.col("mean")) / F.col("sd_exp"))
    per_gene = (
        expr.join(F.broadcast(fit_df), "gene")
        .groupBy("gene")
        .agg(F.sum(z * z).alias("_s_nz"),
             F.count("*").alias("_nnz"),
             F.first("mean").alias("mean"),
             F.first("variance").alias("variance"),
             F.first("sd_exp").alias("sd_exp"),
             F.first("_n").alias("_n"))
    )
    z0g = (F.lit(0.0) - F.col("mean")) / F.col("sd_exp")
    return per_gene.select(
        "gene", "mean", "variance", "sd_exp",
        ((F.col("_s_nz") + (F.col("_n") - F.col("_nnz")) * z0g * z0g)
         / (F.col("_n") - F.lit(1.0))).alias("std_variance"),
    )


def find_variable_features_vst(expr: DataFrame, n_top: int = 2000,
                               value_col: str = "count",
                               span: float = 0.3,
                               n_cells: int | None = None) -> DataFrame:
    """M6 end-to-end: top ``n_top`` genes by vst standardized variance
    (ties broken by gene id)."""
    sv = vst_standardized_variance(expr, value_col, span, n_cells)
    return sv.orderBy(F.desc("std_variance"), "gene").limit(n_top)


def find_variable_features_quad(expr: DataFrame, n_top: int = 2000,
                                value_col: str = "count",
                                n_cells: int | None = None) -> DataFrame:
    """M6 end-to-end with the ORACLE-EXACT smoother: top ``n_top``
    genes by :func:`vst_quadfit_variance`, ranked on the
    6dp-ROUNDED standardized variance with the gene id as tie-break.
    The rounding is the selection's determinism contract: engines
    differ at ~1e-12 in the float aggregation order, so ranking raw
    values could flip the boundary gene; ranking rounded values
    cannot (the same convention as every rank-on-float query in the
    registry)."""
    sv = vst_quadfit_variance(expr, value_col, n_cells)
    return (sv.withColumn("_r", F.round("std_variance", 6))
            .orderBy(F.desc("_r"), "gene").limit(n_top).drop("_r"))


def scale_data(normalized: DataFrame, value_col: str = "normalized",
               clip_max: float = 10.0,
               n_cells: int | None = None,
               n_cells_src: DataFrame | None = None) -> DataFrame:
    """M7: per-gene z-score of normalized values over *all* cells
    (zero-inclusive moments), clipped at clip_max. Returns nonzero
    entries with a ``scaled`` column; the implicit-zero z-score is
    -mean/sd per gene (constant, attachable from the moments table).
    Zero-variance genes scale to 0.0 (Seurat ScaleData semantics —
    NULL would silently drop them from downstream aggregations).

    Single-pass plan: the per-gene moments come from window aggregates
    over a gene-partitioned shuffle of the SAME evaluation that emits
    the rows — the ``normalized`` lineage (itself a join) is computed
    once, not once for stats and again for the projection. Only the
    scalar N needs a second (cheap, map-side-combined) subplan;
    pass ``n_cells_src`` (e.g. the raw expression table) so that
    subplan is a 2-column scan instead of re-evaluating the normalize
    join lineage. When scaling an HVG-subset frame, ``n_cells_src``
    is also the semantically right N: every cell counts, including
    cells expressing no HVG gene."""
    if n_cells is not None:
        base = normalized.withColumn("_n_cells", F.lit(float(n_cells)))
    else:
        src = n_cells_src if n_cells_src is not None else normalized
        base = normalized.crossJoin(F.broadcast(
            n_cells_df(src.select("sample", "barcode"))))
    w_g = W.partitionBy("gene")
    s = F.sum(value_col).over(w_g)
    ss = F.sum(F.col(value_col) ** 2).over(w_g)
    mu = s / F.col("_n_cells")
    sd = F.sqrt((ss - s ** 2 / F.col("_n_cells"))
                / (F.col("_n_cells") - F.lit(1.0)))
    return (
        base.withColumn(
            "scaled",
            F.when(sd <= F.lit(0.0), F.lit(0.0)).otherwise(
                F.least(F.lit(clip_max), (F.col(value_col) - mu) / sd)
            ),
        )
        .drop("_n_cells")
    )
