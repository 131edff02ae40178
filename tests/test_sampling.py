"""Deterministic split/sample properties (extensions/sampling.py)."""

from pyspark.sql import functions as F

from data_ingest_spark.extensions.sampling import (hash_split,
                                                   stratified_sample)

def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_split_partitions_every_row(spark):
    docs = _docs(spark)
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = dict(out.groupBy("split").count().collect())
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_split_is_content_addressed_not_layout_dependent(spark):
    docs = _docs(spark)
    full = {r["doc_id"]: r["split"] for r in
            hash_split(docs, "doc_id", {"a": 0.5, "b": 0.5},
                       seed=3).collect()}
    # A subset of the data, differently partitioned, assigns the same
    # splits to the same ids — incremental arrival never moves rows.
    sub = docs.filter(F.col("doc_id") % 3 == 0).repartition(7)
    part = {r["doc_id"]: r["split"] for r in
            hash_split(sub, "doc_id", {"a": 0.5, "b": 0.5},
                       seed=3).collect()}
    assert part and all(full[k] == v for k, v in part.items())


def test_stratified_sample_fraction_and_determinism(spark):
    docs = _docs(spark)
    n = docs.count()
    s1 = stratified_sample(docs, "doc_id", 0.2, seed=7)
    assert abs(s1.count() / n - 0.2) < 0.12
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            stratified_sample(docs, "doc_id", 0.2, seed=7)
            .select("doc_id").collect()}
    assert ids1 == ids2
    # a different seed draws a different set
    ids3 = {r["doc_id"] for r in
            stratified_sample(docs, "doc_id", 0.2, seed=8)
            .select("doc_id").collect()}
    assert ids1 != ids3


def test_sample_plan_is_scan_plus_filter_only(spark):
    """No shuffle, no UDF: the sample must stream at scan speed."""
    plan = stratified_sample(_docs(spark), "doc_id", 0.5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_stratified_quota_exact_k_and_stable(spark):
    from data_ingest_spark.extensions.sampling import stratified_quota
    docs = _docs(spark)
    out = stratified_quota(docs, "source", k=3, seed=1)
    counts = dict(out.groupBy("source").count().collect())
    sizes = dict(docs.groupBy("source").count().collect())
    assert all(counts[s] == min(3, sizes[s]) for s in counts)
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            stratified_quota(docs.repartition(9), "source", k=3, seed=1)
            .select("doc_id").collect()}
    assert ids1 == ids2


def test_profile_counts_and_extremes(spark):
    from data_ingest_spark.extensions.profile import profile_table
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, v string")
    p = {r["column"]: r for r in profile_table(df).collect()}
    assert p["id"]["n_rows"] == 3 and p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    assert p["id"]["min_value"] == "1" and p["id"]["max_value"] == "3"
    assert p["v"]["n_nulls"] == 1 and p["v"]["n_distinct"] == 1
    approx = {r["column"]: r["n_distinct"] for r in
              profile_table(df, exact_distinct=False).collect()}
    assert approx["id"] >= 2


def test_negative_samples_properties(spark):
    from data_ingest_spark.harness import registry
    fn, _ = registry.REGISTRY["x32_negative_samples"]
    out = fn(spark, "/root/testdata/sf0.001").collect()
    n_anchors = len({r["anchor_id"] for r in out})
    assert len(out) == 4 * n_anchors
    assert all(r["neg_id"] != r["anchor_id"] for r in out)
    assert all(0 <= r["neg_id"] < n_anchors for r in out)


def test_importance_sample_monotone_in_weight(spark):
    from data_ingest_spark.extensions.sampling import importance_sample
    rows = ([(i, 1.0) for i in range(100)]          # always kept
            + [(i, 0.0) for i in range(100, 200)]   # never kept
            + [(i, 0.5) for i in range(200, 400)])  # ~25% at T=2
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r["doc_id"]
            for r in importance_sample(df, "w", temperature=2.0).collect()}
    assert set(range(100)) <= kept
    assert not kept & set(range(100, 200))
    mid = len(kept & set(range(200, 400)))
    assert 25 <= mid <= 75                     # hash-binomial around 50
    again = {r["doc_id"]
             for r in importance_sample(df, "w", temperature=2.0).collect()}
    assert kept == again                       # exactly reproducible


def test_decayed_counts_halving(spark):
    from datetime import datetime as dt
    from data_ingest_spark.extensions.profile import decayed_counts
    rows = [
        (1, dt(2024, 1, 2, 0, 0), 1.0),   # age 0 at asof -> w = 1
        (1, dt(2024, 1, 1, 0, 0), 1.0),   # age = 1 half-life -> w = 0.5
        (2, dt(2024, 1, 3, 0, 0), 1.0),   # after asof -> excluded
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in decayed_counts(
        ev, half_life_s=86400.0,
        asof_expr="TIMESTAMP '2024-01-02 00:00:00'").collect()}
    assert out[1]["decayed_count"] == 1.5
    assert out[1]["n_events"] == 2
    assert 2 not in out


def test_leakage_safe_split_co_assigns_duplicates(spark):
    """All docs in a duplicate cluster receive the SAME split; docs in
    no pair keep their plain hash_split assignment (stable under
    corpus growth)."""
    from data_ingest_spark.extensions.sampling import (hash_split,
                                                       leakage_safe_split)
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(30)] + [(100, "text 7")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(7, 100)], "id_a long, id_b long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["doc_id"]: (r["rep"], r["split"])
           for r in leakage_safe_split(docs, pairs, w).collect()}
    assert out[7] == out[100]          # same rep, same split
    assert out[7][0] == 7
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(docs, "doc_id", w).collect()}
    for i in range(30):
        if i != 7:
            assert out[i] == (i, plain[i]), i
