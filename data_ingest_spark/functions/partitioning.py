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

import os

from pyspark.sql import DataFrame, functions as F


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition `df` to `factor * defaultParallelism`
    partitions IF its current plan yields fewer — the small-input /
    single-file case. No-op (and no added shuffle) otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   num_buckets: int = 16) -> None:
    """Persist `df` as a bucketed+sorted parquet table so every future
    equi-join or aggregation on `keys` is co-located: Spark reads the
    bucket layout from the catalog and plans SortMergeJoin with NO
    Exchange on either side. This is the 100 TB answer to 'the same
    join key is used by every stage': pay the shuffle once at write
    time, never again. (tests/test_partitioning.py asserts the
    no-shuffle join plan.)

    Idempotent across sessions: drops a catalog entry AND a leftover
    warehouse directory from a previous (in-memory-catalog) session —
    saveAsTable refuses a location that exists without a table."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table.lower()),
                  ignore_errors=True)
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(num_buckets, *keys).sortBy(*keys).saveAsTable(table))


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


def morton_code(x, y, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative int columns —
    the multi-dimensional clustering key behind Z-ordered layouts:
    sorting by it co-locates rows close in BOTH dimensions, so
    min/max-based data skipping prunes on either column. Pure integer
    bit arithmetic (identical in any engine)."""
    from pyspark.sql import functions as F
    # Disjoint bit positions: summation == bitwise OR (and Column `|`
    # is logical OR in PySpark, so + is also the correct spelling).
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = (code
                + F.shiftleft(F.shiftright(x, i) % 2, 2 * i)
                + F.shiftleft(F.shiftright(y, i) % 2, 2 * i + 1))
    return code


def zorder_write(df, path: str, col_x: str, col_y: str,
                 n_files: int = 8, bits: int = 16) -> None:
    """Write parquet Z-ordered on (col_x, col_y): range-partition by
    the Morton code, sort within partitions — each output file then
    holds a compact Z-curve segment, giving tight per-file min/max on
    both columns for scan-time skipping."""
    from pyspark.sql import functions as F
    coded = df.withColumn("_z", morton_code(F.col(col_x), F.col(col_y),
                                            bits))
    (coded.repartitionByRange(n_files, "_z").sortWithinPartitions("_z")
     .drop("_z").write.mode("overwrite").parquet(path))


def compact_parquet(spark, src_path: str, dst_path: str,
                    target_mb: int = 512) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_mb`` each — the maintenance pass every long-lived 100 TB
    table needs (streaming sinks and fine-grained ingests leave
    thousands of KB-scale files whose open/footer overhead dominates
    scans). Sizing is derived from the SOURCE's actual on-disk bytes
    (sum of file sizes via the input_file listing), so the result
    tracks compression ratio instead of guessing from row counts.
    Returns the number of output files written.

    The write itself is a plain repartition(n) -> parquet: one round-
    robin shuffle, no driver materialization, safe at any scale.
    (File sizes come from the local filesystem here; an object-store
    deployment swaps the getsize loop for its FS listing API.)"""
    import math

    from pyspark.sql import functions as F

    df = spark.read.parquet(src_path)
    files = [r[0] for r in
             df.select(F.input_file_name().alias("f")).distinct().collect()]
    total_bytes = 0
    for f in files:
        p = f.removeprefix("file://")
        try:
            import os
            total_bytes += os.path.getsize(p)
        except OSError:
            pass
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    out = spark.read.parquet(dst_path)
    return out.select(F.input_file_name()).distinct().count()


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               salt: int = 16) -> DataFrame:
    """Skew-resistant aggregation: shard each key across ``salt``
    partial groups, aggregate, then combine partials per key. Both
    stages map-side combine, so a single monster key costs
    1/``salt``th of a task per stage instead of one unsplittable
    reducer. ``aggs`` maps column -> 'sum' | 'count' | 'min' | 'max'
    (the algebraic functions whose partials recombine exactly; avg =
    sum/count composed by the caller).

    Prefer the plain groupBy until a key is provably hot — salting
    doubles the shuffle count; it wins only when the straggler costs
    more than the extra (tiny, pre-combined) second shuffle.
    """
    from pyspark.sql import functions as F

    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in _PARTIAL:
            raise ValueError(f"unsupported agg '{fn}'; "
                             f"use {sorted(_PARTIAL)}")
    shard = F.floor(F.rand(seed=7) * salt).cast("int")
    partial = (df.withColumn("_salt", shard)
               .groupBy(*keys, "_salt")
               .agg(*[_PARTIAL[fn](c).alias(f"_{fn}_{c}")
                      for c, fn in aggs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[_COMBINE[fn](f"_{fn}_{c}").alias(f"{fn}_{c}")
                   for c, fn in aggs.items()]))


def skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top_k`` heaviest keys with
    their corpus share, skew factor (count ÷ mean key count) and a
    salt hint (how many salt buckets bring the key down to ~mean) —
    the planning step before reaching for ``salted_join``/
    ``salted_agg`` or trusting AQE's skew-join split. Returns
    ``(key, cnt, share, skew_factor, salt_hint)``.

    Determinism: counts and the salt hint are exact integers
    (``(cnt·n_keys) div total + 1``); share and skew_factor are each
    one long-division — hash-exact vs the SQL oracle. Plan: one
    grouped count (map-side combined), a distributed top-k cut, and
    the 1-row totals broadcast back."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("_total"),
                     F.count("*").alias("_nk"))
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    return (top.crossJoin(F.broadcast(tot))
            .select(F.col("key"),
                    F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.col("cnt") / F.col("_total"), 6)
                    .alias("share"),
                    F.round(F.col("cnt") * F.col("_nk") / F.col("_total"),
                            6).alias("skew_factor"),
                    (F.expr("(cnt * _nk) div _total") + 1).cast("long")
                    .alias("salt_hint")))
