"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship slice (SURVEY.md §7: expression →
per-cell metrics → size filter → LogNormalize) on sf0.001.
``queries()``/``oracle_sql()`` expose the operator registry
(data_ingest_spark/harness/registry.py): one named query per
implemented SURVEY.md §2 operator plus the LLM-pipeline extensions,
each with a DuckDB-equivalent ANSI-SQL oracle where expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingest_spark.harness import registry
from data_ingest_spark.operators import filters as fl, metrics as mx, normalize as nz


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The SURVEY.md §7 minimum slice: long expression table → A1/A2
    per-cell metrics → F1 min-cell-size filter → M5 LogNormalize →
    per-cell mean normalized expression. One lazy plan: two
    aggregations + one join, no collects.
    """
    sf = "/root/testdata/sf0.001"
    expr = registry.expr_df(spark, sf)
    cells = mx.cell_counts(expr)
    kept = fl.filter_min_cell_size(cells, 100.0)
    normalized = nz.log_normalize(expr)
    per_cell = normalized.groupBy("sample", "barcode").agg(
        F.avg("normalized").alias("mean_normalized"),
        F.sum("count").alias("total_umi"),
    )
    return kept.join(per_cell, ["sample", "barcode"]).select(
        "sample", "barcode",
        F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("nFeature_RNA").cast("long").alias("nfeature"),
        F.round("mean_normalized", 6).alias("mean_normalized"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
