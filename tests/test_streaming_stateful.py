"""applyInPandasWithState operators: cross-micro-batch state must
dedup / accumulate correctly. The file stream runs maxFilesPerTrigger=1
so each parquet file becomes its own micro-batch."""

import os
import time

import pyspark.sql.functions as F
import pytest

from data_ingest_spark.streaming import stateful as st

HASH_SCHEMA = "content_hash string, doc_id long"
EVENT_SCHEMA = "user_id long, value double"


def _write_batches(spark, tmpdir, schema, batches):
    """One FLAT parquet file per batch (the file-stream source does not
    descend into Spark's directory-per-write layout), mtimes strictly
    increasing so the source picks them up in order."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(tmpdir, exist_ok=True)
    names = [f.strip().split()[0] for f in schema.split(",")]
    for i, rows in enumerate(batches):
        path = os.path.join(tmpdir, f"b{i}.parquet")
        cols = {n: [r[j] for r in rows] for j, n in enumerate(names)}
        pq.write_table(pa.table(cols), path)
        t = time.time() + i
        os.utime(path, (t, t))
    return tmpdir


def _drain(df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def test_streaming_dedup_first_occurrence_only(spark, tmp_path):
    d = _write_batches(spark, str(tmp_path / "h"), HASH_SCHEMA, [
        [("A", 10), ("B", 20), ("A", 11)],
        [("A", 30), ("C", 40)],
    ])
    stream = (spark.readStream.schema(HASH_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = _drain(st.streaming_dedup(stream), "t_dedup", "append")
    rows = {r["content_hash"]: r["doc_id"] for r in out.collect()}
    # every hash exactly once, ids from the batch that introduced them
    assert out.count() == 3
    assert rows["B"] == 20 and rows["C"] == 40
    assert rows["A"] in (10, 30)  # batch order may vary; once either way


def test_running_user_stats_accumulate(spark, tmp_path):
    d = _write_batches(spark, str(tmp_path / "e"), EVENT_SCHEMA, [
        [(1, 5.0), (1, 7.0), (2, 1.0)],
        [(1, 3.0), (2, 9.0), (3, 2.0)],
    ])
    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = _drain(st.running_user_stats(stream), "t_stats", "update")
    # update-mode memory sink appends each emission; the running values
    # are monotone so the final state per user is the row max
    final = (out.groupBy("user_id")
             .agg(F.max("n_events").alias("n"),
                  F.max("total_value").alias("s"),
                  F.max("max_value").alias("mx")))
    got = {r["user_id"]: (r["n"], r["s"], r["mx"]) for r in final.collect()}
    assert got[1] == (3, 15.0, 7.0)
    assert got[2] == (2, 10.0, 9.0)
    assert got[3] == (1, 2.0, 2.0)


def test_streaming_dedup_native_within_watermark(spark, tmp_path):
    import datetime as dt
    schema = "content_hash string, doc_id long, ts timestamp"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    d = _write_batches(spark, str(tmp_path / "n"), schema, [
        [("A", 10, t0), ("B", 20, t0), ("A", 11, t0)],
        [("A", 30, t0 + dt.timedelta(minutes=1)),
         ("C", 40, t0 + dt.timedelta(minutes=2))],
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    out = _drain(st.streaming_dedup_native(stream, ["content_hash"]),
                 "t_dedup_native", "append")
    assert out.count() == 3  # A, B, C each exactly once
    assert {r["content_hash"] for r in out.collect()} == {"A", "B", "C"}


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stopping a checkpointed query and restarting it after new input
    arrives must process ONLY the new files (offset log) and never
    re-emit old rows into the append sink — the exactly-once resume
    contract a production ingest relies on."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batches(spark, src, EVENT_SCHEMA, [
        [(1, 1.0), (2, 2.0)],
    ])

    def run_once():
        stream = (spark.readStream.schema(EVENT_SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("doubled", F.col("value") * 2))
        q = (stream.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 2

    _write_batches(spark, src, EVENT_SCHEMA, [
        [(3, 3.0)],
    ])
    # second batch file needs a distinct name from batch 0's
    os.rename(os.path.join(src, "b0.parquet"),
              os.path.join(src, "b9.parquet"))
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3                       # 2 old + 1 new, no re-emit
    assert {r["user_id"] for r in rows} == {1, 2, 3}
    assert all(r["doubled"] == r["value"] * 2 for r in rows)


def test_stateful_sequence_continues_across_batches(spark, tmp_path):
    from data_ingest_spark.streaming.stateful import stateful_sequence
    src = _write_batches(spark, str(tmp_path / "seq"),
                         "user_id long, event_id long", [
        [(7, 100), (7, 101), (8, 200)],
        [(7, 102), (8, 201), (8, 202)],
    ])
    stream = (spark.readStream.schema("user_id long, event_id long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = _drain(stateful_sequence(stream), "seqs", "append")
    got = {(r["user_id"], r["event_id"]): r["seq"] for r in out.collect()}
    assert got[(7, 100)] == 0 and got[(7, 101)] == 1
    assert got[(7, 102)] == 2              # continues across the batch gap
    assert got[(8, 200)] == 0 and got[(8, 201)] == 1 and got[(8, 202)] == 2


def test_streaming_corpus_curation_end_to_end(spark, tmp_path):
    """Incremental curation: a document stream is deduped across
    micro-batches (first occurrence wins), quality-gated, and appended
    to a curated parquet corpus via foreachBatch — the streaming twin
    of extensions.curate: new corpus slices flow in continuously and
    exactly-once."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from data_ingest_spark.extensions.text import pii_redact, tokens_col
    from data_ingest_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    long = " ".join(f"w{i}" for i in range(35))
    batches = [
        [(1, long + " one"), (2, "too short")],
        [(3, long + " one"), (4, long + " four")],   # 3 dups 1's content
    ]
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"d{i}.parquet")
        pq.write_table(pa.table({"doc_id": [r[0] for r in rows],
                                 "text": [r[1] for r in rows]}), p)
        t = time.time() + i
        os.utime(p, (t, t))

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    hashed = stream.select(
        F.md5(F.col("text").cast("binary")).alias("content_hash"),
        "doc_id")
    firsts = streaming_dedup(hashed)

    def absorb(bdf, _epoch):
        docs = bdf.sparkSession.read.parquet(src)
        batch = (bdf.join(docs, "doc_id")
                 .withColumn("n_tokens", F.size(tokens_col("text")))
                 .filter(F.col("n_tokens") >= 30))
        clean = pii_redact(batch).select("doc_id", "clean_text")
        (batch.select("doc_id", "n_tokens").join(clean, "doc_id")
         .write.mode("append").parquet(out))

    q = (firsts.writeStream.foreachBatch(absorb)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 4}        # 2 gated, 3 deduped across batches


def test_streaming_neardup_ingest_against_persistent_index(spark, tmp_path):
    """Streaming near-dup gate over the persistent banded index: epoch
    0 seeds the index; epoch 1's head-truncated copy of an epoch-0
    document is caught by the bucket join + exact-Jaccard verify,
    quarantined into the pairs table, and kept OUT of the curated
    corpus; replaying an epoch's foreachBatch call leaves every output
    unchanged (tagged-overwrite idempotence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from data_ingest_spark.streaming.neardup_ingest import (
        neardup_ingest_batch, start_neardup_ingest)

    src = str(tmp_path / "docs")
    os.makedirs(src, exist_ok=True)
    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"zzz{i}" for i in range(30))
    batches = [
        [(1, base), (2, other)],
        # 3 = base minus its first two words (the planted near-dup),
        # 4 = novel
        [(3, " ".join(base.split()[2:])),
         (4, " ".join(f"qq{i}" for i in range(30)))],
    ]
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"d{i}.parquet")
        pq.write_table(pa.table({"doc_id": [r[0] for r in rows],
                                 "text": [r[1] for r in rows]}), p)
        t = time.time() + i
        os.utime(p, (t, t))

    idx = str(tmp_path / "idx")
    cur = str(tmp_path / "curated")
    prs = str(tmp_path / "pairs")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_neardup_ingest(stream, idx, cur, prs,
                             str(tmp_path / "ck"), threshold=0.5)
    q.awaitTermination(120)

    kept = {r["doc_id"] for r in spark.read.parquet(cur).collect()}
    assert kept == {1, 2, 4}
    got_pairs = [(r["id_new"], r["id_old"])
                 for r in spark.read.parquet(prs).collect()]
    assert got_pairs == [(3, 1)]

    # replay epoch 1 (at-least-once redelivery): outputs unchanged
    fn = neardup_ingest_batch(idx, cur, prs, threshold=0.5)
    bdf = spark.createDataFrame(batches[1], ["doc_id", "text"])
    fn(bdf, 1)
    assert {r["doc_id"] for r in spark.read.parquet(cur).collect()} \
        == {1, 2, 4}
    assert [(r["id_new"], r["id_old"])
            for r in spark.read.parquet(prs).collect()] == [(3, 1)]


def test_neardup_ingest_string_ids_epoch0_schema(spark, tmp_path):
    """Round-6 ADVICE (low): the first-epoch EMPTY pairs frame must
    carry the id column's ACTUAL type. With string doc ids a
    hardcoded 'id_new long' epoch-0 file under pairs_path makes any
    read spanning both epochs fail on schema merge; deriving the type
    from docs.schema keeps the table readable."""
    from data_ingest_spark.streaming.neardup_ingest import (
        neardup_ingest_batch)

    idx = str(tmp_path / "idx")
    cur = str(tmp_path / "curated")
    prs = str(tmp_path / "pairs")
    fn = neardup_ingest_batch(idx, cur, prs, threshold=0.5)
    base = " ".join(f"tok{i}" for i in range(30))
    e0 = spark.createDataFrame(
        [("doc-a", base),
         ("doc-b", " ".join(f"zzz{i}" for i in range(30)))],
        ["doc_id", "text"])
    fn(e0, 0)
    e1 = spark.createDataFrame(
        [("doc-c", " ".join(base.split()[2:]))], ["doc_id", "text"])
    fn(e1, 1)
    # the cross-epoch read is the regression: long epoch-0 ids would
    # fail the parquet schema merge here
    pairs = spark.read.parquet(prs)
    assert dict(pairs.dtypes)["id_new"] == "string"
    assert [(r["id_new"], r["id_old"]) for r in pairs.collect()] \
        == [("doc-c", "doc-a")]
    kept = {r["doc_id"] for r in spark.read.parquet(cur).collect()}
    assert kept == {"doc-a", "doc-b"}


def test_neardup_ingest_mid_epoch_crash_replay(spark, tmp_path):
    """Round-6 verdict ask #6: the streaming gate's recovery story,
    exercised at its two crash windows (mirrors the batch loop's
    mid-crash replay in test_incremental_example.py).

    Window A (epoch 0): crash AFTER build_dedup_index seeded the
    index but BEFORE curated/pairs landed. The replay must take the
    update path against an archive that excludes batch=e0 (= empty),
    keep every doc, and converge to the uncrashed seed state.

    Window B (epoch 1): crash after curated/batch=e1 HALF-wrote
    (garbage rows) and before pairs/batch=e1 existed. The replay must
    overwrite the garbage with the correct gate output and write the
    missing pairs."""
    from data_ingest_spark.extensions.dedup_index import (
        _live_root, build_dedup_index)
    from data_ingest_spark.streaming.neardup_ingest import (
        neardup_ingest_batch)

    idx = str(tmp_path / "idx")
    cur = str(tmp_path / "curated")
    prs = str(tmp_path / "pairs")
    fn = neardup_ingest_batch(idx, cur, prs, threshold=0.5)
    base = " ".join(f"tok{i}" for i in range(30))
    e0 = spark.createDataFrame(
        [(1, base), (2, " ".join(f"zzz{i}" for i in range(30)))],
        ["doc_id", "text"])

    # --- window A: simulate the partial epoch-0 (index only) ---
    build_dedup_index(e0.select("doc_id", "text"), idx, "doc_id",
                      "text", k=3, tag="e0")
    assert os.path.exists(f"{_live_root(idx)}/bands")
    assert not os.path.exists(cur)
    fn(e0, 0)                                   # the replay
    assert {r["doc_id"] for r in spark.read.parquet(cur).collect()} \
        == {1, 2}
    assert spark.read.parquet(prs).count() == 0

    # --- window B: half-written curated, missing pairs ---
    e1 = spark.createDataFrame(
        [(3, " ".join(base.split()[2:])),       # near-dup of 1
         (4, " ".join(f"qq{i}" for i in range(30)))], ["doc_id", "text"])
    garbage = spark.createDataFrame([(999, "GARBAGE")],
                                    ["doc_id", "text"])
    garbage.write.mode("overwrite").parquet(f"{cur}/batch=e1")
    assert not os.path.exists(f"{prs}/batch=e1")
    fn(e1, 1)                                   # the replay
    kept = {r["doc_id"] for r in spark.read.parquet(cur).collect()}
    assert kept == {1, 2, 4}                    # garbage overwritten
    assert [(r["id_new"], r["id_old"])
            for r in spark.read.parquet(prs).collect()] == [(3, 1)]
    # a second replay converges to the same state (idempotence)
    fn(e1, 1)
    assert {r["doc_id"] for r in spark.read.parquet(cur).collect()} \
        == {1, 2, 4}
