"""S1: 10x Genomics (CellRanger V2/V3) MTX directory scan.

Reference: /root/reference/src/1_Preproc.r:35-59 (layout detection:
V2 ships genes.tsv.gz, V3 features.tsv.gz) and :114-142 (Read10X with
gene.column=1, per-sample loop, annotation harvest).

Spark-first design: `spark.read.text` over matrix.mtx[.gz] → strip
the `%%` comment header and the dims line → split into 1-based
(gene_idx, cell_idx, count) → resolve indices against the barcodes /
features dimension files → one long `(sample, barcode, gene, count)`
DataFrame, the engine's canonical sparse encoding (SURVEY §1.1).

Scale notes: the matrix scan parallelizes over file splits (gz is
single-split per file, but each SAMPLE is a separate file, so a
multi-sample experiment reads in parallel — the same axis the
reference loops over sequentially). Features (~30k rows) broadcast;
barcodes (up to ~1e6/sample) join via shuffle hash. Index resolution
needs line numbers, the one genuinely per-partition-imperative step:
`zipWithIndex` (RDD) — stable for ordered text splits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

V2_FILES = {"genes.tsv.gz", "barcodes.tsv.gz", "matrix.mtx.gz"}
V3_FILES = {"features.tsv.gz", "barcodes.tsv.gz", "matrix.mtx.gz"}


def detect_layout(sample_dir: str) -> str:
    """'v2' | 'v3' per check_10x_input (1_Preproc.r:35-59); also accepts
    the uncompressed V2 variant the reference handles by renaming."""
    names = set(os.listdir(sample_dir))
    if V3_FILES <= names:
        return "v3"
    if V2_FILES <= names or {"genes.tsv", "barcodes.tsv", "matrix.mtx"} <= names:
        return "v2"
    raise ValueError(f"{sample_dir}: not a CellRanger V2/V3 layout "
                     f"(found {sorted(names)})")


def _first_present(sample_dir: str, candidates: list[str]) -> str:
    for c in candidates:
        p = os.path.join(sample_dir, c)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"none of {candidates} in {sample_dir}")


def _indexed_lines(spark: SparkSession, path: str, col: str) -> DataFrame:
    """(idx 1-based, <col>) preserving file order."""
    rdd = spark.read.text(path).rdd.zipWithIndex()
    return rdd.map(lambda t: (t[1] + 1, t[0][0])).toDF(["idx", col])


def read_features(spark: SparkSession, sample_dir: str) -> DataFrame:
    """(idx, gene, name) — Ensembl id + symbol, 1-based row index.
    features.tsv layout per 1_Preproc.r:108-112."""
    path = _first_present(
        sample_dir, ["features.tsv.gz", "genes.tsv.gz", "genes.tsv"])
    lines = _indexed_lines(spark, path, "line")
    parts = F.split("line", "\t")
    return lines.select(
        "idx", F.get(parts, 0).alias("gene"),
        F.coalesce(F.get(parts, 1), F.get(parts, 0)).alias("name"))


def read_barcodes(spark: SparkSession, sample_dir: str) -> DataFrame:
    path = _first_present(sample_dir, ["barcodes.tsv.gz", "barcodes.tsv"])
    return _indexed_lines(spark, path, "barcode")


def read_matrix(spark: SparkSession, sample_dir: str) -> DataFrame:
    """(gene_idx, cell_idx, count) from the MatrixMarket COO body."""
    path = _first_present(sample_dir, ["matrix.mtx.gz", "matrix.mtx"])
    lines = _indexed_lines(spark, path, "line")
    # Header = leading '%' comments plus ONE dims line right after them.
    n_comments = lines.filter(F.col("line").startswith("%")).count()
    body = lines.filter(~F.col("line").startswith("%")
                        & (F.col("idx") > n_comments + 1))
    parts = F.split(F.trim("line"), r"\s+")
    # F.get (not getItem): returns NULL past the end instead of the
    # ANSI out-of-bounds error, so a truncated/garbled line degrades to
    # a droppable NULL row rather than failing the whole scan.
    triple = body.select(
        F.get(parts, 0).cast("int").alias("gene_idx"),
        F.get(parts, 1).cast("int").alias("cell_idx"),
        F.get(parts, 2).cast("int").alias("count"),
    )
    return triple.filter(F.col("gene_idx").isNotNull()
                         & F.col("cell_idx").isNotNull()
                         & F.col("count").isNotNull())


def read_10x_sample(spark: SparkSession, sample_dir: str,
                    sample_name: str) -> tuple[DataFrame, DataFrame]:
    """One sample directory → (expression, annotations):
    expression(sample, barcode, gene, count) long DF and
    annotations(gene, name) (1_Preproc.r:129-146 harvest)."""
    detect_layout(sample_dir)
    feats = read_features(spark, sample_dir)
    bcs = read_barcodes(spark, sample_dir)
    mtx = read_matrix(spark, sample_dir)
    expr = (
        mtx.join(F.broadcast(feats.select(F.col("idx").alias("gene_idx"),
                                          "gene")), "gene_idx")
        .join(bcs.select(F.col("idx").alias("cell_idx"), "barcode"),
              "cell_idx")
        .select(F.lit(sample_name).alias("sample"), "barcode", "gene", "count")
    )
    return expr, feats.select("gene", "name")


def read_10x_experiment(spark: SparkSession, input_dir: str,
                        samples: list[str]) -> tuple[DataFrame, DataFrame]:
    """All samples → one long expression DF (sample column = partition
    axis) + union-deduped annotations (1_Preproc.r:143, = A9/U2)."""
    exprs, annots = [], []
    for s in samples:
        e, a = read_10x_sample(spark, os.path.join(input_dir, s), s)
        exprs.append(e)
        annots.append(a)
    from data_ingest_spark.operators.merge import union_dedup
    expr = exprs[0]
    for e in exprs[1:]:
        expr = expr.unionByName(e)
    return expr, union_dedup(annots)
