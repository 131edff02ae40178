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
