"""Structured Streaming vs batch parity: the streaming windowed
aggregations must produce exactly the batch results once the stream is
drained (availableNow trigger, memory sink)."""

import pytest

from data_ingest_spark.harness import registry
from data_ingest_spark.streaming import windows as sw

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return [tuple(r[c] for c in cols) for r in df.orderBy(*cols).collect()]


@pytest.mark.parametrize("stream_fn,batch_name,cols", [
    (sw.tumbling_counts, "e1_tumbling_window",
     ["window_start", "event_type", "n", "total_value"]),
    (sw.sliding_counts, "e2_sliding_window",
     ["window_start", "event_type", "n", "total_value"]),
])
def test_stream_matches_batch(spark, stream_fn, batch_name, cols):
    ev = sw.read_events_stream(spark, SF)
    assert ev.isStreaming
    got = sw.run_available_now(stream_fn(ev), f"t_{batch_name}")
    want = registry.REGISTRY[batch_name][0](spark, SF)
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_session_stream_matches_batch(spark):
    ev = sw.read_events_stream(spark, SF)
    got = sw.run_available_now(sw.session_counts(ev), "t_sessions")
    want = registry.REGISTRY["e3_session_window"][0](spark, SF)
    cols = ["user_id", "session_start", "n", "total_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_stream_defines_on_empty_dir(spark, tmp_path):
    """Start-before-data: defining the stream on an empty directory
    must fall back to the declared schema, not raise 'unable to infer
    schema'. Draining it yields zero rows."""
    ev = sw.read_events_stream(spark, str(tmp_path))
    assert ev.isStreaming
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = sw.run_available_now(sw.tumbling_counts(ev), "t_empty_dir")
    assert got.count() == 0


def test_streaming_corpus_ingest_end_to_end(spark, tmp_path):
    """Full ingestion composition: gate drops short/null docs, dedup
    collapses identical content, batches publish with manifests, and
    re-publishing the same batch id is idempotent (no double-append)."""
    import json

    from data_ingest_spark.streaming.ingest import (batch_publisher,
                                                    streaming_corpus_ingest)

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta", "ts": "2026-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "alpha beta gamma delta", "ts": "2026-01-01T00:01:00Z"},  # dup of 1
        {"doc_id": 3, "text": "xy", "ts": "2026-01-01T00:02:00Z"},                      # too short
        {"doc_id": 4, "text": "unique second document here", "ts": "2026-01-01T00:03:00Z"},
        {"doc_id": None, "text": "orphan row", "ts": "2026-01-01T00:04:00Z"},           # null id
    ]
    (src / "part0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n")

    dest = str(tmp_path / "out")
    q = streaming_corpus_ingest(spark, str(src), dest,
                                str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = spark.read.parquet(f"{dest}/batch=*").select("doc_id").collect()
    ids = sorted(r["doc_id"] for r in got)
    assert len(ids) == 2
    assert 4 in ids and (1 in ids or 2 in ids)  # one survivor of the dup pair
    assert 3 not in ids

    man = spark.read.parquet(f"{dest}/_manifest")
    assert man.agg({"n_docs": "sum"}).collect()[0][0] == 2

    # idempotent replay: re-publishing batch 0's content under the same
    # batch id must leave totals unchanged (replay input comes from the
    # SOURCE side, so materialize it off the sink before rewriting)
    surv_rows = spark.read.parquet(f"{dest}/batch=0").collect()
    replay = spark.createDataFrame(surv_rows)
    batch_publisher(dest)(replay, 0)
    again = spark.read.parquet(f"{dest}/batch=*").count()
    assert again == 2
