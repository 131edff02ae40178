"""KMV / HLL sketch properties (extensions/sketches.py)."""

from pyspark.sql import functions as F

from data_ingest_spark.extensions.sketches import hll_distinct, kmv_distinct


def _vals(spark, n, prefix="v"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("val"),
        (F.col("id") % 2).cast("string").alias("grp"))


def test_kmv_is_lossless_below_capacity(spark):
    df = _vals(spark, 40)
    row = kmv_distinct(df, "val", k=64).collect()[0]
    assert row["n_distinct_exact"] == 40
    assert row["kmv_estimate"] == 40.0


def test_kmv_estimate_accuracy_global_and_grouped(spark):
    df = _vals(spark, 5000)
    g = kmv_distinct(df, "val", k=256).collect()[0]
    assert abs(g["kmv_estimate"] - 5000) / 5000 < 0.25   # ~4 sigma
    rows = kmv_distinct(df, "val", k=256, group_cols=["grp"]).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_distinct_exact"] == 2500
        assert abs(r["kmv_estimate"] - 2500) / 2500 < 0.25


def test_kmv_ignores_duplicates(spark):
    df = _vals(spark, 1000)
    dup = df.unionAll(df).unionAll(df)
    a = kmv_distinct(df, "val", k=128).collect()[0]["kmv_estimate"]
    b = kmv_distinct(dup, "val", k=128).collect()[0]["kmv_estimate"]
    assert a == b


def test_hll_within_tolerance(spark):
    df = _vals(spark, 10000)
    est = hll_distinct(df, "val", rsd=0.02).collect()[0]["hll_estimate"]
    assert abs(est - 10000) / 10000 < 0.10
    per = {r["grp"]: r["hll_estimate"]
           for r in hll_distinct(df, "val", group_cols=["grp"]).collect()}
    assert set(per) == {"0", "1"}
    for v in per.values():
        assert abs(v - 5000) / 5000 < 0.10


def test_count_min_upper_bound_and_merge(spark):
    from data_ingest_spark.extensions.sketches import (count_min_build,
                                                       count_min_estimate)
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1, "v string")
    sketch = count_min_build(df, "v")
    probes = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    est = {r["v"]: r["est_count"]
           for r in count_min_estimate(sketch, probes, "v").collect()}
    assert est["a"] >= 50 and est["b"] >= 7 and est["c"] >= 1
    # width 1024 >> 3 values: no collisions, estimates exact
    assert est == {"a": 50, "b": 7, "c": 1}

    # mergeability: sketch(x ∪ y) == cellwise-sum of sketches
    x = spark.createDataFrame([("a",)] * 30, "v string")
    y = spark.createDataFrame(
        [("a",)] * 20 + [("b",)] * 7 + [("c",)] * 1, "v string")
    sx, sy = count_min_build(x, "v"), count_min_build(y, "v")
    merged = (sx.unionByName(sy).groupBy("row", "pos")
              .agg(F.sum("cell_count").alias("cell_count")))
    whole = {(r["row"], r["pos"]): r["cell_count"]
             for r in sketch.collect()}
    got = {(r["row"], r["pos"]): r["cell_count"] for r in merged.collect()}
    assert got == whole


def test_bloom_no_false_negatives(spark):
    from data_ingest_spark.extensions.sketches import (bloom_build,
                                                       bloom_prune)
    keys = spark.createDataFrame([(i,) for i in range(0, 100, 7)],
                                 "k long")
    bloom = bloom_build(keys, "k")
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    passed = {r["k"] for r in bloom_prune(probe, bloom, "k").collect()}
    members = set(range(0, 100, 7))
    assert members <= passed                 # zero false negatives
    # 4096 bits vs 15 keys: false positives essentially impossible
    assert passed == members


def test_percentile_approx_within_tolerance(spark):
    """approx quantiles (GK sketch) vs exact on a known distribution:
    the approximate path for 100 TB must land within its accuracy
    bound."""
    df = spark.range(10000).select((F.col("id") % 1000).alias("v"))
    row = df.agg(
        F.percentile_approx("v", [0.5, 0.9], 10000).alias("approx"),
        F.expr("percentile(v, array(0.5, 0.9))").alias("exact")).head()
    for a, e in zip(row["approx"], row["exact"]):
        assert abs(a - e) <= 10          # 1% of the 0..999 domain
