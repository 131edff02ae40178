"""Deterministic shard writer (sinks/shards.py) and incremental dedup."""

from pyspark.sql import functions as F

from data_ingest_spark.extensions.dedup import dedup_against
from data_ingest_spark.sinks.shards import (read_shards, shard_manifest,
                                            verify_shards, write_shards)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_write_read_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_shards(docs, path, n_shards=4)
    back = read_shards(spark, path)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 4
    assert sorted(back.drop("shard").columns) == sorted(docs.columns)
    assert verify_shards(spark, path)


def test_shard_assignment_is_layout_independent(spark, tmp_path):
    docs = _docs(spark)
    m1 = {r["shard"]: r["id_checksum"] for r in
          shard_manifest(docs, "doc_id", 8).collect()}
    m2 = {r["shard"]: r["id_checksum"] for r in
          shard_manifest(docs.repartition(13), "doc_id", 8).collect()}
    assert m1 == m2


def test_read_shard_subset_prunes_partitions(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_shards(docs, path, n_shards=4)
    sub = read_shards(spark, path, shards=[1, 2])
    whole = read_shards(spark, path)
    got = sub.count()
    assert 0 < got < whole.count()
    # partition pruning: the scan only touches the two shard dirs
    sub.collect()
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "shard" in plan


def test_dedup_against_drops_seen_and_batch_dups(spark):
    existing = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(10, "alpha"),           # already in corpus -> dropped
         (11, "gamma"), (12, "gamma"),  # batch dup -> keep 11 only
         (13, "delta")],
        "doc_id long, text string")
    out = sorted(r["doc_id"] for r in
                 dedup_against(incoming, existing).collect())
    assert out == [11, 13]


def test_snapshot_diff_classifies_all_transitions(spark):
    from data_ingest_spark.extensions.cdc import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B!"), (4, "d")], "doc_id long, text string")
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = {r["doc_id"]: r["change"] for r in
            snapshot_diff(old, new, include_unchanged=True).collect()}
    assert full[1] == "unchanged" and len(full) == 4


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from data_ingest_spark.sinks.shards import compact_parquet
    import glob
    src = str(tmp_path / "frag")
    _docs(spark).repartition(24).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 24
    dest = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dest, target_file_bytes=10**9)
    assert n == 1
    assert len(glob.glob(dest + "/*.parquet")) == 1
    assert (spark.read.parquet(dest).count()
            == spark.read.parquet(src).count())


def test_cap_repetitions_keeps_at_most_k(spark):
    from data_ingest_spark.extensions.dedup import cap_repetitions
    rows = [(i, "dup") for i in range(10)] + [(100, "unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cap_repetitions(df, k=3)
    counts = dict(out.groupBy("text").count().collect())
    assert counts == {"dup": 3, "unique": 1}
    # layout-stable survivor set
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         cap_repetitions(df.repartition(7), k=3).collect()}
    assert a == b
