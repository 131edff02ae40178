"""S6–S11: export sinks.

References: TSV exports src/4_Prepare_experiment.r:167-201 & the flag
file src/3_Seurat.r:136; MTX export (transposed) :204-214; config JSON
:338-357; cell-sets JSON src/5_Upload-to-aws.py:138-196; checksum id
:37-42,201-207; DynamoDB/S3 uploads :267-302 (stubbed — out of
correctness scope behind an interface).

Single-file exports (`coalesce(1)`) mirror the reference's file
contract and are driver-light: data streams through one task, never
through the driver. The partitioned variants are the 100 TB path.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, functions as F


def write_tsv(df: DataFrame, path: str, header: bool = True,
              single_file: bool = True) -> None:
    """S6: TSV sink. single_file=True reproduces the reference's
    one-file contract (write.table); False keeps full parallelism."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.csv(path, sep="\t", header=header)


def write_mtx(expr: DataFrame, path: str, value_col: str = "count") -> None:
    """S7: MatrixMarket COO sink, TRANSPOSED like the reference
    (writeMM(t(...)) — cells as rows): lines `cell_idx gene_idx value`
    after the two header lines. Indices must already be dense 1-based
    (`cell_idx`, `gene_idx` columns). Header dims are aggregated
    lazily; the body is written by Spark with a global sort-key so the
    header sorts first — one text file, one pass."""
    dims = expr.agg(
        F.max("cell_idx").alias("nr"), F.max("gene_idx").alias("nc"),
        F.count("*").alias("nnz")).collect()[0]
    header = expr.sparkSession.createDataFrame(
        [(0, "%%MatrixMarket matrix coordinate integer general"),
         (1, f"{dims['nr']} {dims['nc']} {dims['nnz']}")],
        "ord long, line string")
    body = expr.select(
        (F.lit(2)).alias("ord"),
        F.concat_ws(" ", "cell_idx", "gene_idx", value_col).alias("line"))
    (header.unionByName(body).orderBy("ord").select("line")
     .coalesce(1).write.mode("overwrite").text(path))


def cell_sets_json(cells: DataFrame, key_col: str, name: str,
                   set_type: str, colors: list[str] | None = None) -> dict:
    """S8/A11/J7: the cell-sets JSON tree
    (src/5_Upload-to-aws.py:138-157): children = one node per distinct
    key value with its sorted cellIds array; colors assigned from the
    pool in key order. The collect is of (n_groups) rows of id arrays —
    the reference's own output size."""
    grouped = (
        cells.groupBy(key_col)
        .agg(F.sort_array(F.collect_list("cells_id")).alias("cellIds"))
        .orderBy(key_col)
        .collect()
    )
    children = []
    for i, row in enumerate(grouped):
        child = {
            "key": f"{name}-{row[key_col]}",
            "name": str(row[key_col]),
            "cellIds": [int(x) for x in row["cellIds"]],
        }
        if colors:
            child["color"] = colors[i % len(colors)]
        children.append(child)
    return {"key": name, "name": name, "rootNode": True,
            "children": children, "type": set_type}


def write_json(obj: dict, path: str) -> None:
    """S8: config/cell-sets JSON emission (driver-side, scalar
    metadata). The reference's true/false/null gsub fixups
    (4_Prepare_experiment.r:350-357) are unnecessary with a real JSON
    encoder."""
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, sort_keys=True)


def experiment_checksum(paths: list[str]) -> str:
    """A12: md5 over the concatenation of output files, silently
    skipping missing ones (replicates src/5_Upload-to-aws.py:37-42,
    201-207 — including the skip-missing behavior its stray
    r-out-cells.tsv name depends on)."""
    h = hashlib.md5()
    for p in paths:
        if not os.path.exists(p):
            continue
        with open(p, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


class UploadSink:
    """S9/S10 stub interface: the reference's DynamoDB put_item and S3
    uploads (src/5_Upload-to-aws.py:267-302). Records pass through
    `put_record`/`put_object`; the default sink collects them in memory
    for tests; a production subclass wires boto3. Cloud creds and
    network are intentionally absent here."""

    def __init__(self) -> None:
        self.records: list[tuple[str, dict]] = []
        self.objects: list[tuple[str, bytes]] = []

    def put_record(self, table: str, record: dict) -> None:
        self.records.append((table, record))

    def put_object(self, key: str, body: bytes) -> None:
        self.objects.append((key, body))
