"""M8: PCA over the scaled HVG matrix (Spark ML).

Reference: RunPCA(npcs=50) at
/root/reference/src/QC_helpers/dataIntegration.r:109; explained
variance consumed at :33-36.

Pipeline shape: long (cell, gene, value) → per-cell SparseVector in
HVG index space (one groupBy) → `pyspark.ml.feature.PCA`. The
covariance accumulation in Spark ML is a distributed treeAggregate
over rows — the scalable path; only the (n_hvg × k) principal-axis
matrix lives on the driver.
"""

from __future__ import annotations

from pyspark.ml.feature import PCA as MLPCA
from pyspark.ml.linalg import SparseVector, VectorUDT
from pyspark.sql import DataFrame, Window as W, functions as F


def assemble_vectors(values: DataFrame, hvgs: DataFrame,
                     value_col: str = "scaled") -> DataFrame:
    """(sample, barcode, features: SparseVector) — cells as sparse
    vectors over the HVG vocabulary. The gene→index map is the
    broadcast side; assembly is one groupBy over the (already
    HVG-filtered) long table."""
    # Ungrouped window is intentional: the vocabulary is the HVG list,
    # bounded by nfeatures (~2000) regardless of corpus size, so the
    # single task holds thousands of rows, never the data.
    vocab = hvgs.select("gene").distinct().withColumn(
        "_gidx", F.row_number().over(W.orderBy("gene")) - 1)
    dim = vocab.count()

    pairs = (
        values.join(F.broadcast(vocab), "gene")
        # sum duplicate (cell, gene) entries first: SparseVector needs
        # strictly-increasing unique indices, and a long table is not
        # guaranteed pre-aggregated. Same shuffle key ⇒ no extra stage.
        .groupBy("sample", "barcode", "_gidx")
        .agg(F.sum(value_col).alias("_v"))
        .groupBy("sample", "barcode")
        .agg(F.sort_array(F.collect_list(F.struct("_gidx", "_v")))
             .alias("_pairs"))
    )

    @F.udf(returnType=VectorUDT())
    def to_vec(pairs_list):
        idx = [p["_gidx"] for p in pairs_list]
        vals = [float(p["_v"]) for p in pairs_list]
        return SparseVector(dim, idx, vals)

    return pairs.select("sample", "barcode", to_vec("_pairs").alias("features"))


def run_pca(vectors: DataFrame, k: int = 50):
    """Fit + transform; returns (scores DF with `pc` vector column,
    explained_variance list). Deterministic up to component sign."""
    n_features = vectors.select("features").head()["features"].size
    k = min(k, n_features)
    model = MLPCA(k=k, inputCol="features", outputCol="pc").fit(vectors)
    scores = model.transform(vectors).select(
        "sample", "barcode", "pc")
    return scores, list(model.explainedVariance)


def pc_columns(scores: DataFrame, k: int) -> DataFrame:
    """Explode the pc vector to plain double columns pc_0..pc_{k-1}
    (the long-term storage layout: Parquet-friendly, oracle-friendly)."""
    to_arr = F.udf(lambda v: [float(x) for x in v], "array<double>")
    arr = scores.withColumn("_a", to_arr("pc"))
    cols = [F.col("_a").getItem(i).alias(f"pc_{i}") for i in range(k)]
    return arr.select("sample", "barcode", *cols)
