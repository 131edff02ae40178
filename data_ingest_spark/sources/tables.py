"""S2–S5: schema'd TSV/CSV contract readers, dense-table scan, JSON
config, and Parquet checkpointing.

Every intermediate-file contract from FIXTURES.md §B gets an explicit
StructType (SURVEY §1.2: "explicit schemas on every reader").
References: doublet scores src/help.r:8-17; annotations
src/1_Preproc.r:143-146 & src/3_Seurat.r:67; flag file
src/3_Seurat.r:135-136 → src/4_Prepare_experiment.r:91; dense table
src/1_Preproc.r:150-160; config src/1_Preproc.r:72-93,166; RDS
checkpoints src/1_Preproc.r:174 et al. → Parquet here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

DOUBLET_SCORES_SCHEMA = StructType([
    StructField("barcode", StringType()),
    StructField("doublet_scores", DoubleType()),
    StructField("doublet_class", StringType()),
])

ANNOTATIONS_SCHEMA = StructType([
    StructField("input", StringType()),
    StructField("name", StringType()),
])

FLAG_SCHEMA = StructType([
    StructField("samples", StringType()),
    StructField("flag_filtered", StringType()),
])


def read_doublet_scores(spark: SparkSession, path: str) -> DataFrame:
    """doublet-scores-<sample>.csv: headerless barcode/score/class
    (src/2-2_Compute-metrics_doublets.r:35-38)."""
    return spark.read.csv(path, sep="\t", header=False,
                          schema=DOUBLET_SCORES_SCHEMA)


def read_features_annotations(spark: SparkSession, path: str) -> DataFrame:
    """features_annotations.tsv with header (src/1_Preproc.r:146);
    renamed to the engine's (gene, name) contract."""
    df = spark.read.csv(path, sep="\t", header=True,
                        schema=ANNOTATIONS_SCHEMA)
    return df.select(F.col("input").alias("gene"), "name")


def read_flag_file(spark: SparkSession, path: str) -> DataFrame:
    """df_flag_filtered.txt: (samples, 'Filtered'|'Unfiltered') with a
    derived boolean (src/5_Upload-to-aws.py:79-85 semantics)."""
    df = spark.read.csv(path, sep="\t", header=True, schema=FLAG_SCHEMA)
    return df.withColumn("prefiltered", F.col("flag_filtered") == "Filtered")


def read_dense_table(spark: SparkSession, path: str,
                     sample: str) -> DataFrame:
    """S3: dense text matrix (genes × cells, first column = gene id) →
    long DF via stack (src/1_Preproc.r:150-160; untested in the
    reference, melt here keeps only nonzeros)."""
    raw = spark.read.csv(path, sep="\t", header=True, inferSchema=True)
    gene_col = raw.columns[0]
    cells = raw.columns[1:]
    stack = ", ".join(f"'{c}', `{c}`" for c in cells)
    long = raw.selectExpr(
        f"`{gene_col}` as gene",
        f"stack({len(cells)}, {stack}) as (barcode, count)")
    return long.filter(F.col("count") > 0).select(
        F.lit(sample).alias("sample"), "barcode", "gene",
        F.col("count").cast("int"))


REQUIRED_CONFIG_KEYS = ["name", "input", "samples"]


def load_config(path: str) -> dict:
    """S4: meta.json with the reference's imperative key checks
    (src/1_Preproc.r:78-93). Driver-side — config is scalar metadata."""
    with open(path) as fh:
        cfg = json.load(fh)
    missing = [k for k in REQUIRED_CONFIG_KEYS if k not in cfg]
    if missing:
        raise ValueError(f"meta.json missing keys: {missing}")
    if not isinstance(cfg["samples"], list) or not cfg["samples"]:
        raise ValueError("meta.json: samples must be a non-empty list")
    return cfg


def checkpoint(df: DataFrame, out_dir: str, name: str,
               partition_by: list[str] | None = None) -> str:
    """S5: stage-boundary Parquet checkpoint (the reference's RDS
    restartability contract, src/1_Preproc.r:174). Partitioned by
    `sample` by default so downstream per-sample predicates prune."""
    path = os.path.join(out_dir, name)
    writer = df.write.mode("overwrite")
    cols = partition_by if partition_by is not None else (
        ["sample"] if "sample" in df.columns else None)
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)
    return path


def read_checkpoint(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, name))


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose schema evolved across writes
    (columns added over time, e.g. a corpus that gained a `lang`
    column mid-ingest). ``mergeSchema`` unions the footers' schemas;
    files written before a column existed yield NULL for it.

    Scale note: schema merging reads every file footer up front —
    fine at thousands of files, a real listing cost at millions. For
    long-lived 100 TB datasets prefer a catalog-declared schema and
    plain reads; this reader is the migration/exploration path."""
    return spark.read.option("mergeSchema", "true").parquet(path)


DOCUMENTS_JSONL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
])


def read_jsonl_corpus(spark: SparkSession, path: str,
                      schema: StructType | None = None) -> DataFrame:
    """JSON-Lines corpus reader — the interchange format LLM corpora
    ship in. Explicit schema (no inference pass over 100 TB);
    PERMISSIVE mode routes malformed lines to ``_corrupt_record``
    instead of failing the job, and the caller audits
    ``filter(_corrupt_record IS NOT NULL)`` before dropping it (cache
    the parsed frame first — Spark disallows querying only the corrupt
    column straight off raw files).

    Scale: newline-delimited JSON splits at arbitrary byte offsets, so
    a single huge file still parallelizes; schema projection prunes
    unread fields at parse time."""
    schema = schema or DOCUMENTS_JSONL_SCHEMA
    full = StructType(schema.fields
                      + [StructField("_corrupt_record", StringType())])
    return spark.read.schema(full).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record").json(path)


def write_jsonl_corpus(df: DataFrame, path: str,
                       partitions: int | None = None) -> None:
    """JSON-Lines corpus writer (one object per line, gzip-friendly).
    ``partitions`` controls output file count — repartition BEFORE the
    write so downstream consumers see uniformly-sized files instead of
    one file per upstream task."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """Columnar ORC sink (Spark's built-in writer) — the interchange
    format for Hive/Trino-adjacent warehouses, next to the parquet
    checkpoints. Compression defaults to zstd like the parquet path."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; predicate pushdown and column pruning work the same
    as parquet (pinned by the roundtrip test)."""
    return spark.read.orc(path)
