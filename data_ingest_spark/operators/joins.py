"""Metadata-assembly joins (SURVEY.md §2.3 J1–J7).

Every join in the reference is an equi-join of the big cell/expression
table against a small lookup (emptyDrops results, doublet scores, gene
annotations, per-sample config). The uniform physical strategy is a
broadcast hash join — no shuffle of the big side. At 100 TB the big
side streams through executors once while the dimension is replicated.

Reference citations:
  J1 src/3_Seurat.r:97-109   (left_join emptyDrops columns)
  J2 src/3_Seurat.r:80-87    (match-assign doublet scores)
  J3 src/4_Prepare_experiment.r:73-76 (annotation align)
  J4 src/help.r:35-41        (sample metadata propagation)
  J5 src/3_Seurat.r:72       (MT feature semi-join)
  J6 src/5_Upload-to-aws.py:80-85 (flag lookup)
  J7 src/5_Upload-to-aws.py:146-156 (group membership collect)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_emptydrops(cells: DataFrame, emptydrops: DataFrame,
                    keys: list[str] | None = None) -> DataFrame:
    """J1: attach emptyDrops_{Total,LogProb,PValue,Limited,FDR} columns
    by barcode; unmatched cells get NULLs (left join)."""
    keys = keys or ["sample", "barcode"]
    renamed = emptydrops
    for c in renamed.columns:
        if c not in keys and not c.startswith("emptyDrops_"):
            renamed = renamed.withColumnRenamed(c, f"emptyDrops_{c}")
    return cells.join(F.broadcast(renamed), keys, "left")


def join_doublet_scores(cells: DataFrame, scores: DataFrame,
                        keys: list[str] | None = None) -> DataFrame:
    """J2: attach doublet_scores / doublet_class; unmatched stay NULL."""
    keys = keys or ["sample", "barcode"]
    return cells.join(F.broadcast(scores), keys, "left")


def align_annotations(genes: DataFrame, expr: DataFrame) -> DataFrame:
    """J3: restrict the gene annotation table to genes present in the
    matrix (inner join against the distinct gene set)."""
    present = expr.select("gene").distinct()
    return genes.join(present, "gene", "inner")


def join_sample_metadata(cells: DataFrame, sample_meta: DataFrame,
                         key: str = "sample") -> DataFrame:
    """J4: propagate per-sample metadata variables onto every cell."""
    return cells.join(F.broadcast(sample_meta), key, "left")


def semi_join_features(genes: DataFrame, expr: DataFrame) -> DataFrame:
    """J5: genes from a candidate list that are present in the matrix."""
    return genes.join(expr.select("gene").distinct(), "gene", "left_semi")


def join_flag(samples: DataFrame, flags: DataFrame, key: str = "sample") -> DataFrame:
    """J6: per-sample preFiltered flag lookup."""
    return samples.join(F.broadcast(flags), key, "left")


def group_membership(cells: DataFrame, key: str, id_col: str = "cells_id") -> DataFrame:
    """J7/A11: cellIds array per group value, sorted for determinism."""
    return cells.groupBy(key).agg(
        F.sort_array(F.collect_list(id_col)).alias("cell_ids"),
        F.count("*").alias("n_cells"),
    )
