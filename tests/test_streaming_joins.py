"""Stream-stream interval join ≡ its batch twin; stream-static enrich."""

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from data_ingest_spark.streaming.joins import (stream_static_enrich,
                                               stream_stream_interval_join)

SCHEMA = "event_id long, user_id string, ts timestamp, value double"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_batches(tmpdir, batches):
    os.makedirs(tmpdir, exist_ok=True)
    names = [f.strip().split()[0] for f in SCHEMA.split(",")]
    for i, rows in enumerate(batches):
        path = os.path.join(tmpdir, f"b{i}.parquet")
        cols = {n: [r[j] for r in rows] for j, n in enumerate(names)}
        pq.write_table(pa.table(cols), path)
        t = time.time() + i
        os.utime(path, (t, t))
    return tmpdir


def _drain(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return df.sparkSession.table(name)


def _sec(s):
    return T0 + dt.timedelta(seconds=s)


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    purchases = [[(1, "u1", _sec(100), 9.0), (2, "u2", _sec(200), 8.0)],
                 [(3, "u1", _sec(400), 7.0)]]
    clicks = [[(11, "u1", _sec(80), 0.0), (12, "u1", _sec(95), 0.0),
               (13, "u2", _sec(300), 0.0)],
              [(14, "u1", _sec(390), 0.0), (15, "u3", _sec(50), 0.0)]]
    pd_dir = _write_batches(str(tmp_path / "p"), purchases)
    cl_dir = _write_batches(str(tmp_path / "c"), clicks)

    def read(d):
        return (spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(d))

    out = _drain(stream_stream_interval_join(
        read(pd_dir), read(cl_dir), on="user_id",
        lower_s=-60.0, upper_s=0.0, watermark="5 minutes"),
        "t_ssj")
    got = sorted((r["event_id"], r["event_id_r"]) for r in out.collect())
    # batch twin: same interval condition on static frames
    lp = spark.createDataFrame([r for b in purchases for r in b], SCHEMA)
    lc = spark.createDataFrame([r for b in clicks for r in b], SCHEMA)
    want = sorted((r["event_id"], r["cid"]) for r in lp.join(
        lc.select(F.col("event_id").alias("cid"),
                  F.col("user_id").alias("cuid"),
                  F.col("ts").alias("cts")),
        (F.col("user_id") == F.col("cuid"))
        & (F.col("cts") >= F.col("ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("cts") <= F.col("ts"))).collect())
    assert got == want and len(got) == 3


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """leftOuter interval join: purchases with no click in the window
    still emit, with NULL right-side columns, once the watermark
    passes — the state-eviction semantics inner joins never exercise."""
    purchases = [[(1, "u1", _sec(100), 9.0),      # matched by click 11
                  (2, "u2", _sec(200), 8.0)],     # no click in window
                 [(3, "u9", _sec(250), 7.0)]]     # user with no clicks
    clicks = [[(11, "u1", _sec(80), 0.0),
               (13, "u2", _sec(500), 0.0)],       # outside the window
              # late high-ts rows on both sides advance the watermark
              # far enough to close and emit the unmatched state
              [(19, "u1", _sec(5000), 0.0)]]
    purchases.append([(9, "u1", _sec(5100), 1.0)])
    pd_dir = _write_batches(str(tmp_path / "p2"), purchases)
    cl_dir = _write_batches(str(tmp_path / "c2"), clicks)

    def read(d):
        return (spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1).parquet(d))

    out = _drain(stream_stream_interval_join(
        read(pd_dir), read(cl_dir), on="user_id",
        lower_s=-60.0, upper_s=0.0, watermark="5 minutes",
        how="leftOuter"), "t_ssj_lo")
    pairs = {(r["event_id"], r["event_id_r"]) for r in out.collect()}
    assert (1, 11) in pairs          # matched pair
    assert (2, None) in pairs        # in-stream user, no click in window
    assert (3, None) in pairs        # user never clicks
    inner = {p for p in pairs if p[1] is not None}
    assert inner <= {(1, 11), (9, 19)}


def test_stream_static_enrich_broadcasts(spark, tmp_path):
    ev_dir = _write_batches(str(tmp_path / "e"),
                            [[(1, "u1", _sec(10), 1.0),
                              (2, "u9", _sec(20), 2.0)]])
    dim = spark.createDataFrame([("u1", "gold")], "user_id string, tier string")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(ev_dir))
    out = _drain(stream_static_enrich(stream, dim, "user_id"), "t_sse")
    rows = {r["event_id"]: r["tier"] for r in out.collect()}
    assert rows == {1: "gold", 2: None}


def test_scd2_history_intervals(spark):
    from datetime import datetime as dt
    from data_ingest_spark.extensions.cdc import scd2_history
    rows = [
        (1, 7, dt(2024, 1, 1, 0, 0), "a"),
        (2, 7, dt(2024, 1, 1, 0, 5), "a"),   # same attr -> merges
        (3, 7, dt(2024, 1, 1, 0, 9), "b"),   # change
        (4, 7, dt(2024, 1, 1, 0, 12), "a"),  # back to a: new interval
        (5, 8, dt(2024, 1, 1, 1, 0), "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    hist = sorted(scd2_history(ev).collect(),
                  key=lambda r: (r["user_id"], r["valid_from"]))
    u7 = [r for r in hist if r["user_id"] == 7]
    assert [r["event_type"] for r in u7] == ["a", "b", "a"]
    assert u7[0]["n_events"] == 2 and u7[0]["valid_to"] == u7[1]["valid_from"]
    assert u7[2]["valid_to"] is None          # current interval open
    assert hist[-1]["user_id"] == 8 and hist[-1]["valid_to"] is None


def test_merge_upsert_semantics(spark):
    from data_ingest_spark.extensions.cdc import merge_upsert
    tgt = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    src = spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k long, v string")
    got = {r["k"]: r["v"] for r in merge_upsert(tgt, src, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}
    import pytest as _pt
    with _pt.raises(ValueError):
        merge_upsert(tgt, src.select("v", "k"), ["k"])


def test_foreachbatch_upsert_snapshot(spark, tmp_path):
    """Streaming → keyed snapshot via foreachBatch + merge_upsert:
    each micro-batch upserts into a parquet snapshot (staging dir +
    atomic swap), so the snapshot always holds the latest value per
    key — the streaming ingest pattern for a mutable dimension."""
    import shutil
    from data_ingest_spark.extensions.cdc import merge_upsert
    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate([[(1, "a"), (2, "b")],
                              [(2, "B"), (3, "c")]]):
        p = os.path.join(src, f"up{i}.parquet")
        pq.write_table(pa.table({"k": [r[0] for r in rows],
                                 "v": [r[1] for r in rows]}), p)
        t = time.time() + i
        os.utime(p, (t, t))

    def apply_batch(bdf, _epoch):
        batch = bdf.dropDuplicates(["k"])
        if os.path.exists(snap):
            target = bdf.sparkSession.read.parquet(snap)
            merged = merge_upsert(target, batch, ["k"])
        else:
            merged = batch
        staging = snap + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(snap):
            shutil.rmtree(snap)
        os.rename(staging, snap)

    q = (spark.readStream.schema("k long, v string")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["k"]: r["v"] for r in spark.read.parquet(snap).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scd2_history_matches_python_mirror_hypothesis(spark):
    """Differential property: the gaps-and-islands SCD2 collapse equals
    a sequential Python mirror on random attribute streams (including
    duplicate timestamps, resolved by the tie column)."""
    from hypothesis import given, settings, strategies as st

    from data_ingest_spark.extensions.cdc import scd2_history

    def _none_safe(t):
        # valid_to is None for the current interval; sort NULLs last
        # (Python can't compare None with int)
        return (t[0], t[1], t[2], t[3] is None, t[3] or 0, t[4])

    def mirror(rows):
        out = []
        by_key = {}
        for k, a, t, e in rows:
            by_key.setdefault(k, []).append((t, e, a))
        for k, evs in by_key.items():
            evs.sort()
            runs = []
            for t, e, a in evs:
                if runs and runs[-1][0] == a:
                    runs[-1][2] += 1
                else:
                    runs.append([a, t, 1])
            for i, (a, t, n) in enumerate(runs):
                nxt = runs[i + 1][1] if i + 1 < len(runs) else None
                out.append((k, a, t, nxt, n))
        return sorted(out, key=_none_safe)

    key = st.sampled_from([1, 2])
    attr = st.sampled_from(["a", "b"])
    ts = st.integers(min_value=0, max_value=8)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(key, attr, ts), min_size=1, max_size=12))
    def run(raw):
        rows = [(k, a, t, i) for i, (k, a, t) in enumerate(raw)]
        df = spark.createDataFrame(
            rows, "user_id int, event_type string, ts int, event_id int")
        got = sorted(((r["user_id"], r["event_type"], r["valid_from"],
                       r["valid_to"], r["n_events"])
                      for r in scd2_history(df).collect()), key=_none_safe)
        assert got == mirror(rows), rows

    run()
