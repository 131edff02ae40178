"""Deterministic training-shard writer.

A 100 TB training pipeline doesn't end at a DataFrame — it ends at a
directory of fixed-count, content-addressed shards a data loader can
stream, resume, and spot-check. This sink writes exactly ``n_shards``
parquet shard directories plus a manifest:

  path/shard=<k>/part-*.parquet     one file per shard
  path/_shard_manifest/             (shard, n_rows, min_id, max_id,
                                     id_checksum)

Properties the loader relies on:
- shard assignment is ``hash_bucket(id) % n_shards`` (seeded md5, see
  extensions/sampling.py): a row's shard never depends on partition
  layout, cluster size, or arrival order, so re-running the pipeline
  on the same corpus reproduces byte-identical shard membership;
- rows within a shard are sorted by ``sort_cols`` (default: the id),
  so file contents are deterministic too;
- the manifest's ``id_checksum`` (xor of per-row md5-prefix hashes; a
  commutative fold, order-independent) lets a reader audit a shard
  without re-reading the corpus.

Plan shape: one ``repartition(n_shards, shard)`` shuffle +
sortWithinPartitions — the minimum possible for a sharded sorted
output. The manifest is computed in the same pass shape (groupBy
shard), not by re-reading written files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingest_spark.extensions.sampling import hash_bucket

MANIFEST_DIR = "_shard_manifest"


def _with_shard(df: DataFrame, id_col: str, n_shards: int,
                seed: int) -> DataFrame:
    return df.withColumn(
        "shard", (hash_bucket(F.col(id_col), seed) % n_shards).cast("int"))


def shard_manifest(df: DataFrame, id_col: str, n_shards: int,
                   seed: int = 0) -> DataFrame:
    """(shard, n_rows, min_id, max_id, id_checksum) without writing."""
    withs = _with_shard(df, id_col, n_shards, seed)
    rowh = F.conv(F.substring(F.md5(F.col(id_col).cast("string")
                                    .cast("binary")), 1, 15), 16, 10) \
        .cast("long")
    return (withs.withColumn("_rh", rowh).groupBy("shard")
            .agg(F.count("*").alias("n_rows"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id"),
                 F.expr("bit_xor(_rh)").alias("id_checksum")))


def write_shards(df: DataFrame, path: str, n_shards: int,
                 id_col: str = "doc_id", sort_cols: list[str] | None = None,
                 seed: int = 0) -> None:
    """Write ``df`` as ``n_shards`` deterministic sorted shards."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    sort_cols = sort_cols or [id_col]
    withs = _with_shard(df, id_col, n_shards, seed)
    (withs.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", *sort_cols)
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    (shard_manifest(df, id_col, n_shards, seed)
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/{MANIFEST_DIR}"))


def read_shards(spark: SparkSession, path: str,
                shards: list[int] | None = None) -> DataFrame:
    """Read back all shards, or a subset by shard id (partition-pruned
    — only the requested shard directories are scanned)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def verify_shards(spark: SparkSession, path: str, id_col: str = "doc_id",
                  seed: int = 0) -> bool:
    """Recompute the manifest from shard contents and compare."""
    manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}")
    n = manifest.count()
    data = read_shards(spark, path).drop("shard")
    fresh = shard_manifest(data, id_col, n, seed)
    cols = ["shard", "n_rows", "min_id", "max_id", "id_checksum"]
    a = {tuple(r) for r in manifest.select(*cols).collect()}
    b = {tuple(r) for r in fresh.select(*cols).collect()}
    return a == b


def compact_parquet(spark: SparkSession, src: str, dest: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None) -> int:
    """Rewrite a small-file parquet directory as ``ceil(bytes/target)``
    right-sized files; returns the output file count.

    Small-file proliferation (streaming micro-batches, per-task
    outputs) is the classic long-lived-dataset killer: every file costs a
    driver listing, a footer read, and a task. Input size comes from
    the filesystem listing, not a scan; the rewrite is one job —
    repartition(n) (plus optional sortWithinPartitions for locality).
    Writes to a NEW directory: atomic swap/retirement of the old one
    is the caller's (catalog's) move.
    """
    import glob as _glob
    import os as _os
    total = sum(_os.path.getsize(p)
                for p in _glob.glob(_os.path.join(src, "**", "*.parquet"),
                                    recursive=True))
    n = max(1, -(-total // int(target_file_bytes)))
    df = spark.read.parquet(src)
    out = df.repartition(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(dest)
    return n
