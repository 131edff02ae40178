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

import pandas as pd
from pyspark.ml.feature import PCA as MLPCA
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, Window as W, functions as F


def assemble_vectors(values: DataFrame, hvgs: DataFrame,
                     value_col: str = "scaled") -> DataFrame:
    """(sample, barcode, features: Vector) — cells as vectors over the
    HVG vocabulary. The gene→index map is the broadcast side; assembly
    is one groupBy over the (already HVG-filtered) long table, then an
    Arrow-batched scatter into dense arrays (numpy, never row-at-a-time
    pickling) and a JVM-side `array_to_vector`. Dense is the right
    layout here: the vocabulary is capped at n_top HVGs (~2000), so a
    cell is ≤16 KB regardless of corpus size."""
    # Two-pass rank over the (bounded, ~nfeatures) HVG list — same
    # gene-ascending dense index as a global window, no single-task
    # WindowExec.
    from data_ingest_spark.operators.windows import dense_ids_scalable
    vocab = dense_ids_scalable(hvgs.select("gene").distinct(),
                               order=["gene"], id_col="_gidx")
    dim = vocab.count()

    pairs = (
        values.join(F.broadcast(vocab), "gene")
        # sum duplicate (cell, gene) entries first: a long table is not
        # guaranteed pre-aggregated. Same shuffle key ⇒ no extra stage.
        .groupBy("sample", "barcode", "_gidx")
        .agg(F.sum(value_col).alias("_v"))
        .groupBy("sample", "barcode")
        .agg(F.collect_list(F.struct("_gidx", "_v")).alias("_pairs"))
    )

    @F.pandas_udf("array<double>")
    def scatter(pairs_s: pd.Series) -> pd.Series:
        import numpy as np

        def one(lst):
            out = np.zeros(dim)
            for p in lst:
                out[p["_gidx"]] = float(p["_v"])
            return out
        return pairs_s.map(one)

    return pairs.select(
        "sample", "barcode",
        array_to_vector(scatter("_pairs")).alias("features"))


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
    (the long-term storage layout: Parquet-friendly, oracle-friendly).
    `vector_to_array` is the built-in JVM conversion — no Python."""
    arr = scores.withColumn("_a", vector_to_array("pc"))
    cols = [F.col("_a").getItem(i).alias(f"pc_{i}") for i in range(k)]
    return arr.select("sample", "barcode", *cols)
