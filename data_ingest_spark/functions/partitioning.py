"""Partitioning utilities shared by CPU-heavy per-row operators.

A parquet scan produces one partition per ~`spark.sql.files.
maxPartitionBytes` of input, so a small (or single-file / gzip) corpus
scans into fewer partitions than the cluster has cores and everything
downstream of the scan — shingle explosion, hashing, decode UDFs —
runs nearly serial. `spread` widens such inputs; on a 100 TB input the
scan already yields >= cores splits and `spread` is a no-op, adding no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition `df` to `factor * defaultParallelism`
    partitions IF its current plan yields fewer — the small-input /
    single-file case. No-op (and no added shuffle) otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Skew-resistant equi-join: salt the BIG side's key with a random
    shard in [0, salt) and replicate the SMALL side across all shards,
    so one hot key spreads over `salt` reducers instead of one.

    Use when the small side is too big to broadcast AND the key
    distribution is skewed (AQE's skew-join split handles sort-merge
    skew adaptively, but only splits partitions — a single monster key
    still lands in one task; salting shards WITHIN the key). The small
    side is replicated `salt`× — size accordingly.
    """
    from pyspark.sql import functions as F

    shard = F.floor(F.rand(seed=7) * salt).cast("int")
    b = big.withColumn("_salt", shard)
    s = small.crossJoin(
        F.broadcast(small.sparkSession.range(salt)
                    .select(F.col("id").cast("int").alias("_salt"))))
    return b.join(s, keys + ["_salt"], how).drop("_salt")
