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
