"""functions.partitioning: spread must widen narrow scans and no-op on
wide ones; salted_join must produce exactly the plain join's result
while sharding the hot key."""

import pyspark.sql.functions as F

from data_ingest_spark.functions.partitioning import salted_join, spread


def test_spread_widens_narrow_input(spark):
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = spread(narrow)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_noop_on_wide_input(spark):
    already = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism * 2)
    assert spread(already) is already


def test_salted_join_matches_plain_join(spark):
    # one monster key (90% of rows) + a long tail
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("v"))
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(1800, 1900)],
        "k string, w double")
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"))
    salted = salted_join(big, small, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"))
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    small = spark.createDataFrame([("a", 10.0)], "k string, w double")
    out = salted_join(big, small, ["k"], how="left").collect()
    got = {r["k"]: r["w"] for r in out}
    assert got == {"a": 10.0, "b": None}


def test_bucketed_join_no_shuffle(spark):
    from data_ingest_spark.functions.partitioning import write_bucketed
    from data_ingest_spark.plans import shuffle_count
    a = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("x"))
    b = spark.range(1000).select(F.col("id"), (F.col("id") * 3).alias("y"))
    write_bucketed(a, "t_bkt_a", ["id"], num_buckets=8)
    write_bucketed(b, "t_bkt_b", ["id"], num_buckets=8)
    joined = (spark.table("t_bkt_a")
              .join(spark.table("t_bkt_b").hint("merge"), "id"))
    # bucket layout makes both sides pre-partitioned and pre-sorted:
    # the merge join needs no Exchange at all
    assert shuffle_count(joined) == 0
    assert joined.count() == 1000


def test_hive_partition_pruning(spark, tmp_path):
    """A date-partitioned layout must prune at planning time: a
    single-partition predicate reads one directory, and the scan node
    reports the partition filter — the layout contract for any
    date-keyed 100 TB table."""
    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("day"))
    path = str(tmp_path / "by_day")
    df.write.partitionBy("day").mode("overwrite").parquet(path)

    back = spark.read.parquet(path).filter(F.col("day") == "1")
    assert back.count() == 100
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("day=1" in r[0] for r in files)


def test_observe_stage_metrics_single_pass(spark, tmp_path):
    from data_ingest_spark.functions.observe import observe_stage
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        .alias("v"))
    obs, audited = observe_stage(
        df, "gate", {"n_null_v": F.sum(F.col("v").isNull().cast("long"))})
    audited.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"n_rows": 100, "n_null_v": 10}


def test_zorder_write_locality(spark, tmp_path):
    """Z-ordered files must carry tight ranges on BOTH dimensions:
    after sorting by the Morton code, each output file's x-range and
    y-range span a fraction of the domain (the property min/max data
    skipping exploits)."""
    from data_ingest_spark.functions.partitioning import (morton_code,
                                                          zorder_write)
    import itertools
    rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z")
    zorder_write(df, path, "x", "y", n_files=16, bits=6)

    per_file = (spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg((F.max("x") - F.min("x")).alias("xr"),
                     (F.max("y") - F.min("y")).alias("yr"))
                .collect())
    assert len(per_file) >= 8
    avg_span = sum(r["xr"] + r["yr"] for r in per_file) / (2 * len(per_file))
    assert avg_span <= 32          # each file covers <= half the domain

    got = df.select(morton_code(F.col("x"), F.col("y"), 6).alias("z")) \
            .agg(F.count_distinct("z")).head()[0]
    assert got == 4096             # interleave is a bijection on 6+6 bits


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from data_ingest_spark.functions.partitioning import compact_parquet
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    # 40 tiny files
    spark.range(0, 4000).repartition(40).write.parquet(src)
    import os
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 40
    n_out = compact_parquet(spark, src, dst, target_mb=512)
    assert n_out == 1  # everything fits one 512MB target file
    # data integrity: same ids
    back = spark.read.parquet(dst)
    assert back.count() == 4000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(4000))


def test_salted_agg_matches_plain_groupby(spark):
    from data_ingest_spark.functions.partitioning import salted_agg
    import pyspark.sql.functions as F
    # one monster key (90% of rows) + normal keys
    df = spark.range(0, 10000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 7) END AS k",
        "CAST(id AS DOUBLE) AS v")
    got = {r["k"]: (r["sum_v"], r["count_v"], r["min_v"], r["max_v"])
           for r in salted_agg(df, ["k"], {"v": "sum"}, salt=8)
           .join(salted_agg(df, ["k"], {"v": "count"}, salt=8), "k")
           .join(salted_agg(df, ["k"], {"v": "min"}, salt=8), "k")
           .join(salted_agg(df, ["k"], {"v": "max"}, salt=8), "k")
           .collect()}
    want = {r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
            for r in df.groupBy("k").agg(
                F.sum("v").alias("s"), F.count("v").alias("c"),
                F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1] and got[k][2] == want[k][2] \
            and got[k][3] == want[k][3], k
        assert abs(got[k][0] - want[k][0]) < 1e-6, k
