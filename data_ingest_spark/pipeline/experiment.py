"""Experiment façade: the engine's answer to the Seurat object.

SURVEY §1.1: no monolithic object — each slot is its own DataFrame;
the façade just carries them together with the config-derived misc
dict. Slots mirror the reference's usage sites: @assays counts/data →
`expression`/`normalized`; @meta.data → `cells`; @misc gene
annotations → `genes`; @reductions → `reductions`.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingest_spark.operators import joins as jn, metrics as mx, windows as wd


@dataclass
class Experiment:
    expression: DataFrame                 # long (sample, barcode, gene, count)
    cells: DataFrame                      # per-barcode metadata
    genes: DataFrame | None = None        # (gene, name)
    normalized: DataFrame | None = None   # + normalized column
    reductions: DataFrame | None = None   # (sample, barcode, pc_*)
    misc: dict[str, Any] = field(default_factory=dict)

    def with_(self, **kw) -> "Experiment":
        return replace(self, **kw)

    def subset_cells(self, kept_cells: DataFrame) -> "Experiment":
        """Filter every per-cell slot by a kept (sample, barcode) set —
        the engine's version of Seurat subset(): one semi-join per
        slot, lazily composed."""
        keys = kept_cells.select("sample", "barcode")
        out = {"cells": self.cells.join(keys, ["sample", "barcode"],
                                        "left_semi"),
               "expression": self.expression.join(
                   keys, ["sample", "barcode"], "left_semi")}
        if self.normalized is not None:
            out["normalized"] = self.normalized.join(
                keys, ["sample", "barcode"], "left_semi")
        if self.reductions is not None:
            out["reductions"] = self.reductions.join(
                keys, ["sample", "barcode"], "left_semi")
        return self.with_(**out)

    _SLOTS = ("expression", "cells", "genes", "normalized", "reductions")

    def save(self, out_dir: str) -> str:
        """Stage-boundary checkpoint of every populated slot as a
        sample-partitioned parquet dataset plus misc.json — the
        engine's version of the reference's between-stage RDS files
        (src/1_Preproc.r:174, src/3_Seurat.r:125): a later job resumes
        from disk instead of recomputing the lineage."""
        from data_ingest_spark.sources.tables import checkpoint
        os.makedirs(out_dir, exist_ok=True)
        for slot in self._SLOTS:
            df = getattr(self, slot)
            if df is not None:
                checkpoint(df, out_dir, slot)
        with open(os.path.join(out_dir, "misc.json"), "w") as fh:
            json.dump(self.misc, fh, default=str)
        return out_dir

    @classmethod
    def load(cls, spark: SparkSession, out_dir: str) -> "Experiment":
        from data_ingest_spark.sources.tables import read_checkpoint
        kw: dict[str, Any] = {}
        for slot in cls._SLOTS:
            if os.path.isdir(os.path.join(out_dir, slot)):
                kw[slot] = read_checkpoint(spark, out_dir, slot)
        misc_path = os.path.join(out_dir, "misc.json")
        if os.path.exists(misc_path):
            with open(misc_path) as fh:
                kw["misc"] = json.load(fh)
        return cls(**kw)


def validate_experiment(exp: Experiment) -> list[str]:
    """The engine's version of the reference's final-object testthat
    suite (src/test_object.r:4-50): returns a list of violated
    invariants (empty = valid). Checks are single aggregations —
    cheap enough to run at every stage boundary.

      - required cell columns present (test_object.r:5-12)
      - cells_id dense 0..n-1 (test_object.r:26-29)
      - percent_mt within [0, 100] / fraction_mt within [0, 1]
      - no duplicated (gene) ids and no duplicated gene names after W6
        (test_object.r:47)
    """
    problems: list[str] = []
    required = {"sample", "barcode", "nCount_RNA", "nFeature_RNA"}
    missing = required - set(exp.cells.columns)
    if missing:
        problems.append(f"cells missing columns {sorted(missing)}")
    if "cells_id" in exp.cells.columns:
        stats = exp.cells.agg(
            F.count("*").alias("n"),
            F.min("cells_id").alias("lo"), F.max("cells_id").alias("hi"),
            F.countDistinct("cells_id").alias("nd")).head()
        if not (stats["lo"] == 0 and stats["hi"] == stats["n"] - 1
                and stats["nd"] == stats["n"]):
            problems.append(
                f"cells_id not dense 0..{stats['n'] - 1}: "
                f"min={stats['lo']} max={stats['hi']} distinct={stats['nd']}")
    if "percent_mt" in exp.cells.columns:
        bad = exp.cells.filter(
            (F.col("percent_mt") < 0) | (F.col("percent_mt") > 100)).count()
        if bad:
            problems.append(f"{bad} cells with percent_mt outside [0,100]")
    if exp.genes is not None:
        n, nd = exp.genes.agg(
            F.count("*"), F.countDistinct("gene")).head()
        if n != nd:
            problems.append(f"duplicated gene ids ({n - nd})")
        if "name" in exp.genes.columns:
            n, ndn = exp.genes.agg(
                F.count("*"), F.countDistinct("name")).head()
            if n != ndn:
                problems.append(f"duplicated gene names after dedup "
                                f"({n - ndn})")
    return problems


def assemble_cells(expr: DataFrame, genes: DataFrame | None = None,
                   emptydrops: DataFrame | None = None,
                   doublet_scores: DataFrame | None = None,
                   sample_meta: DataFrame | None = None,
                   mt_pattern: str = "^mt-") -> DataFrame:
    """Stage-3 metadata assembly (src/3_Seurat.r:59-109): per-cell
    counts (A1/A2), percent.mt (J5+A4), emptyDrops columns (J1),
    doublet columns (J2), sample metadata (J4), dense cells_id (W5).
    One lazy plan: two aggregations over the expression table plus
    broadcast joins."""
    cells = mx.cell_counts(expr)
    if genes is not None:
        from data_ingest_spark.operators.filters import mt_gene_predicate
        mt = mt_gene_predicate(genes, mt_pattern).select("gene")
        pm = mx.percent_mt(expr, mt).select(
            "sample", "barcode", "percent_mt", "fraction_mt")
        cells = cells.join(pm, ["sample", "barcode"], "left")
    else:
        cells = cells.withColumn("percent_mt", F.lit(0.0)) \
                     .withColumn("fraction_mt", F.lit(0.0))
    if emptydrops is not None:
        cells = jn.join_emptydrops(cells, emptydrops)
    if doublet_scores is not None:
        cells = jn.join_doublet_scores(cells, doublet_scores,
                                       keys=["sample", "barcode"])
    if sample_meta is not None:
        cells = jn.join_sample_metadata(cells, sample_meta, key="sample")
    return wd.dense_ids_scalable(cells)
