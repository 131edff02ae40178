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
                                init_state)


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
    return sorted(
        tuple(str(v) for v in r)
        for r in spark.read.parquet(os.path.join(root, name))
        .select(*keys).collect())


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
