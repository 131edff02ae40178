"""S1 as a Spark 4 Python Data Source: ``spark.read.format("tenx")``.

The native path (sources/tenx.py: spark.read.text → split → joins)
remains the scale path for huge single samples — it parallelizes
WITHIN a matrix file. This wrapper exposes the same V2/V3 CellRanger
layout through the declarative reader API with one input partition per
sample directory, which is the right granularity for the reference's
actual workload (many samples, each ~10⁵ cells: 1_Preproc.r:110-142) —
samples parse concurrently on executors, nothing touches the driver.

Usage:
    spark.dataSource.register(TenxDataSource)
    df = (spark.read.format("tenx")
          .option("path", input_dir)            # dir of sample subdirs
          .option("samples", "s1,s2").load())
    # -> (sample, barcode, gene, gene_name, count)
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

TENX_SCHEMA = StructType([
    StructField("sample", StringType()),
    StructField("barcode", StringType()),
    StructField("gene", StringType()),
    StructField("gene_name", StringType()),
    StructField("count", LongType()),
])


def _open_maybe_gz(path: str):
    return (gzip.open(path, "rt") if path.endswith(".gz")
            else open(path, "rt"))


def _read_tsv_col(sample_dir: str, names: list[str],
                  n_cols: int) -> list[tuple]:
    from data_ingest_spark.sources.tenx import _first_present
    with _open_maybe_gz(_first_present(sample_dir, names)) as fh:
        return [tuple(line.rstrip("\n").split("\t")[:n_cols])
                for line in fh]


class SamplePartition(InputPartition):
    def __init__(self, sample: str, sample_dir: str):
        self.sample = sample
        self.sample_dir = sample_dir


class TenxReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        samples = options.get("samples", "")
        self.samples = ([s for s in samples.split(",") if s] or
                        sorted(d for d in os.listdir(self.root)
                               if not d.startswith(".")
                               and os.path.isdir(os.path.join(self.root, d))))

    def partitions(self):
        return [SamplePartition(s, os.path.join(self.root, s))
                for s in self.samples]

    def read(self, partition: SamplePartition):
        from data_ingest_spark.sources.tenx import detect_layout, _first_present
        d = partition.sample_dir
        detect_layout(d)
        feats = _read_tsv_col(
            d, ["features.tsv.gz", "genes.tsv.gz", "genes.tsv"], 2)
        bcs = [r[0] for r in _read_tsv_col(
            d, ["barcodes.tsv.gz", "barcodes.tsv"], 1)]
        with _open_maybe_gz(_first_present(
                d, ["matrix.mtx.gz", "matrix.mtx"])) as fh:
            saw_dims = False
            for line in fh:
                if line.startswith("%"):
                    continue
                if not saw_dims:          # first non-comment line = dims
                    saw_dims = True
                    continue
                gi, ci, v = line.split()
                gene, name = feats[int(gi) - 1][0], feats[int(gi) - 1][-1]
                yield (partition.sample, bcs[int(ci) - 1], gene, name,
                       int(float(v)))


class TenxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tenx"

    def schema(self):
        return TENX_SCHEMA

    def reader(self, schema) -> TenxReader:
        return TenxReader(self.options)
