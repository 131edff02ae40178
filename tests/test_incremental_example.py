"""The documented incremental-ingest loop (examples/incremental_ingest)
holds its two load-bearing properties:

  1. merged state ≡ full recompute over seed ∪ batch, bit-for-bit,
     for all three state families (IVF partials, DECIMAL rollup,
     histogram bins) — the associativity the nightly O(batch) refresh
     depends on;
  2. replaying an already-applied batch_id is a NO-OP: every state
     table is byte-identical afterwards (exactly-once ledger).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from incremental_ingest import (applied_batches, ingest_batch,  # noqa: E402
                                init_state, read_state)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc {i} shares words with neighbors {i // 2} and common "
             f"filler text block {'x' * (i % 7)}") for i in ids],
        "doc_id long, text string")


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in ids],
        "vec_id long, embedding array<double>")


def _events(spark, ids):
    return spark.createDataFrame(
        [(f"t{i % 3}", float(i), f"2024-01-{(i % 27) + 1:02d}")
         for i in ids],
        "event_type string, value double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _state(spark, root, name, keys):
    if name.startswith("dedup/"):
        df = spark.read.parquet(os.path.join(root, name))
    else:
        df = read_state(spark, root, name)
    return sorted(
        tuple(str(v) for v in r) for r in df.select(*keys).collect())


@pytest.fixture(scope="module")
def loop_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("incr"))
    init_state(spark, root, _docs(spark, range(0, 10)),
               _emb(spark, range(0, 10)), _events(spark, range(0, 10)))
    out = ingest_batch(spark, root, "day-1", _docs(spark, range(10, 16)),
                       _emb(spark, range(10, 16)),
                       _events(spark, range(10, 16)))
    assert out is not None
    return root


def test_ledger_records_batches(spark, loop_root):
    assert applied_batches(spark, loop_root) == {"seed", "day-1"}


def test_merged_states_equal_full_recompute(spark, loop_root):
    from data_ingest_spark.extensions.cdc import agg_state
    from data_ingest_spark.extensions.similarity import ivf_assign_state
    from data_ingest_spark.extensions.sketches import equi_width_hist

    cents = spark.read.parquet(os.path.join(loop_root, "ivf_centroids"))
    full_ivf = sorted(
        tuple(str(v) for v in r)
        for r in ivf_assign_state(_emb(spark, range(0, 16)), cents)
        .collect())
    assert _state(spark, loop_root, "ivf_state",
                  ["cid", "dim", "n", "sum_q"]) == full_ivf

    full_roll = sorted(
        (r["event_type"], str(r["cnt"]), str(r["sum_value"]))
        for r in agg_state(_events(spark, range(0, 16)),
                           ["event_type"]).collect())
    assert [(a, b, c) for a, b, c, *_ in _state(
        spark, loop_root, "rollup",
        ["event_type", "cnt", "sum_value"])] == full_roll

    full_hist = sorted(
        (str(r["bin"]), str(r["n"]))
        for r in equi_width_hist(
            _docs(spark, range(0, 16)).select(
                F.length("text").cast("double").alias("v")),
            "v", 0.0, 4000.0, 20).collect())
    assert _state(spark, loop_root, "hist", ["bin", "n"]) == full_hist


def test_replay_is_noop(spark, loop_root):
    before = {name: _state(spark, loop_root, name, keys) for name, keys in
              [("ivf_state", ["cid", "dim", "n", "sum_q"]),
               ("rollup", ["event_type", "cnt", "sum_value"]),
               ("hist", ["bin", "n"]),
               ("dedup/bands", ["doc_id", "band", "bucket"])]}
    out = ingest_batch(spark, loop_root, "day-1",
                       _docs(spark, range(10, 16)),
                       _emb(spark, range(10, 16)),
                       _events(spark, range(10, 16)))
    assert out is None
    for name, keys in [("ivf_state", ["cid", "dim", "n", "sum_q"]),
                       ("rollup", ["event_type", "cnt", "sum_value"]),
                       ("hist", ["bin", "n"]),
                       ("dedup/bands", ["doc_id", "band", "bucket"])]:
        assert _state(spark, loop_root, name, keys) == before[name]


def test_mid_crash_replay_is_exactly_once(spark, loop_root):
    """A batch that crashed AFTER its dedup append and one state write
    but BEFORE the ledger commit is replayed to the same final state
    as a clean single application: staged writes are deterministic
    overwrites keyed by batch_id, the archive side excludes the
    batch's own partial subdir, and committed state only moves on the
    ledger append."""
    from incremental_ingest import _state_dir
    from data_ingest_spark.extensions.cdc import agg_state, merge_agg_state
    from data_ingest_spark.extensions.dedup_index import update_dedup_index

    docs = _docs(spark, range(16, 20))
    emb = _emb(spark, range(16, 20))
    ev = _events(spark, range(16, 20))

    # simulate the crash window: dedup appended + one state staged,
    # no ledger row
    crashed_pairs = update_dedup_index(
        spark, os.path.join(loop_root, "dedup"), docs, tag="day-2")
    crashed_pairs.count()
    old_roll = read_state(spark, loop_root, "rollup")
    (merge_agg_state(old_roll, agg_state(ev, ["event_type"]),
                     ["event_type"])
     .write.mode("overwrite")
     .parquet(_state_dir(loop_root, "rollup", "day-2")))
    assert "day-2" not in applied_batches(spark, loop_root)
    committed_before = _state(spark, loop_root, "rollup",
                              ["event_type", "cnt", "sum_value"])

    # orchestrator replays the whole batch
    out = ingest_batch(spark, loop_root, "day-2", docs, emb, ev)
    assert out is not None
    assert "day-2" in applied_batches(spark, loop_root)

    # dedup rows for the batch appear EXACTLY once
    bands = spark.read.parquet(os.path.join(loop_root, "dedup", "bands"))
    batch_rows = bands.filter(F.col("doc_id") >= 16)
    n_per_doc = (batch_rows.groupBy("doc_id", "band").count()
                 .filter("count > 1").count())
    assert n_per_doc == 0
    # rollup advanced by exactly one application of the batch: merged
    # state == full recompute over seed ∪ day-1 ∪ day-2 events
    assert committed_before != _state(
        spark, loop_root, "rollup", ["event_type", "cnt", "sum_value"])
    expected = sorted(
        (r["event_type"], str(r["cnt"]), str(r["sum_value"]))
        for r in agg_state(_events(spark, range(0, 20)),
                           ["event_type"]).collect())
    got = [(a, b, c) for a, b, c, *_ in _state(
        spark, loop_root, "rollup", ["event_type", "cnt", "sum_value"])]
    assert got == expected
