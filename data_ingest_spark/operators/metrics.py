"""Per-cell / per-gene metric aggregations (SURVEY.md §2.4 A1–A10).

All operators take the long expression DataFrame
``(sample, barcode, gene, count)`` and return aggregated DataFrames.
Everything here is a single hash-aggregate plan: Catalyst performs
map-side partial aggregation, so each is one shuffle on its grouping
key regardless of input size. At 100 TB the expression table is
partitioned by ``sample``, making the dominant
``groupBy(sample, barcode)`` shuffle-light (co-partitioned input).

Reference citations (relative to /root/reference/):
  A1  nCount_RNA   colSums          src/2-1_Compute-metrics_emptyDrops.r:42-48
  A2  nFeature_RNA colSums(x>0)     src/2-2_Compute-metrics_doublets.r:34
  A3  per-gene     rowSums          src/4_Prepare_experiment.r:113,116,132
  A4  percent.mt   PercentageFeatureSet  src/3_Seurat.r:69-77
  A5  ambient census                src/2-1_Compute-metrics_emptyDrops.r:36-50
  A6  median per-gene sum           src/4_Prepare_experiment.r:132
  A10 histogram binning             src/4_Prepare_experiment.r:103-125
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cell_counts(expr: DataFrame) -> DataFrame:
    """A1+A2: per-cell UMI total (nCount_RNA) and expressed-gene count
    (nFeature_RNA). The long format stores only nonzeros, so
    nFeature = count of rows with count>0 (guard against explicit 0s)."""
    return expr.groupBy("sample", "barcode").agg(
        F.sum("count").alias("nCount_RNA"),
        F.count(F.when(F.col("count") > 0, 1)).alias("nFeature_RNA"),
    )


def gene_stats(expr: DataFrame) -> DataFrame:
    """A3: per-gene total UMIs and number of cells expressing the gene."""
    return expr.groupBy("gene").agg(
        F.sum("count").alias("total_umi"),
        F.count(F.when(F.col("count") > 0, 1)).alias("n_cells"),
    )


def percent_mt(expr: DataFrame, mt_genes: DataFrame) -> DataFrame:
    """A4: 100 * sum(count | gene is MT) / sum(count) per cell.

    ``mt_genes`` is a 1-column DataFrame ``(gene)`` — small (13 genes in
    human); broadcast so the expression table is scanned exactly once
    with no shuffle beyond the groupBy.
    """
    tagged = expr.join(
        F.broadcast(mt_genes.select("gene").withColumn("is_mt", F.lit(True))),
        "gene",
        "left",
    )
    frac = (
        F.sum(F.when(F.col("is_mt"), F.col("count")).otherwise(F.lit(0.0)))
        / F.sum("count")
    )
    # Emit BOTH scales: the reference's filter consumes fraction.mt on
    # [0,1] (src/QC_helpers/mitochondrialContent.r:38-54) while
    # test_object.r:31-36 asserts percent.mt on [0,100].
    return tagged.groupBy("sample", "barcode").agg(
        (100.0 * frac).alias("percent_mt"),
        frac.alias("fraction_mt"),
    )


def ambient_census(expr: DataFrame, lower: float = 100.0) -> DataFrame:
    """A5: one row per sample — number of ambient barcodes
    (total < lower), min and max barcode total. Drives the
    pre-filtered-vs-not branch (>=50 ambient ⇒ run emptyDrops)."""
    totals = expr.groupBy("sample", "barcode").agg(F.sum("count").alias("total"))
    return totals.groupBy("sample").agg(
        F.count(F.when(F.col("total") < lower, 1)).alias("n_ambient"),
        F.min("total").alias("min_total"),
        F.max("total").alias("max_total"),
    )


def median_gene_sum(expr: DataFrame) -> DataFrame:
    """A6: exact median of per-gene totals (diagnostic scalar)."""
    return gene_stats(expr).agg(F.median("total_umi").alias("median_gene_umi"))


def singlet_max(cells: DataFrame, score_col: str = "doublet_scores",
                class_col: str = "doublet_class",
                group: list[str] | None = None) -> DataFrame:
    """A7: max doublet score among singlets (auto threshold derivation,
    src/QC_helpers/doubletScores_config.r:8-16)."""
    filtered = cells.filter(F.col(class_col) == F.lit("singlet"))
    keys = group or ["sample"]
    return filtered.groupBy(*keys).agg(
        F.max(score_col).alias("max_singlet_score"))


def distinct_values(df: DataFrame, cols: list[str]) -> DataFrame:
    """A8: distinct values of one or more columns
    (src/4_Prepare_experiment.r:332-334)."""
    return df.select(*cols).distinct()


def histogram(df: DataFrame, col: str, bin_step: float, group: list[str] | None = None) -> DataFrame:
    """A10: fixed-width histogram — bin id = floor(x / binStep).
    One shuffle on (group..., bin); at scale this is the canonical
    map-side-combinable aggregation."""
    keys = list(group or []) + [
        F.floor(F.col(col) / F.lit(bin_step)).cast("long").alias("bin")
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .withColumn("bin_start", F.col("bin") * F.lit(bin_step))
    )
