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
