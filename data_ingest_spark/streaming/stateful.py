"""Custom stateful streaming operators via applyInPandasWithState.

Two operators the windowed aggregations can't express:

  streaming_dedup    — emit each key's FIRST occurrence only, across
                       micro-batches: per-key GroupState holds a seen
                       flag with a TTL so state is bounded (the
                       streaming analogue of extensions.dedup.
                       exact_dedup for an unbounded corpus feed).
  running_user_stats — per-user running (count, sum, max) emitted per
                       micro-batch — the streaming analogue of the A1
                       cell-counts aggregate with monotonic state.

State posture at 100 TB/day: state is keyed (content hash / user id)
and partitioned by Spark's shuffle on the grouping key, so state
scales horizontally with executors; the dedup TTL bounds per-key
lifetime; no operator holds unbounded per-key history (only scalars).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

DEDUP_OUT_SCHEMA = StructType([
    StructField("content_hash", StringType()),
    StructField("doc_id", LongType()),
])

DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_dedup(hashed: DataFrame,
                    ttl_minutes: int | None = None) -> DataFrame:
    """First-occurrence pass-through over a stream grouped by
    `content_hash` (input columns: content_hash, doc_id). Emits one row
    per hash the first micro-batch it appears; later occurrences are
    dropped. With `ttl_minutes`, per-key state expires after that long
    without updates (processing-time TTL) — the bounded-state mode for
    unbounded hash spaces."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_seen = not state.exists
        min_id = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            min_id = m if min_id is None else min(min_id, m)
        if state.exists:
            state.update((int(state.get[0]),))
        else:
            state.update((1,))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if first_seen and min_id is not None:
            yield pd.DataFrame({"content_hash": [key[0]],
                                "doc_id": [min_id]})

    return (hashed.groupBy("content_hash")
            .applyInPandasWithState(fn, DEDUP_OUT_SCHEMA,
                                    DEDUP_STATE_SCHEMA, "append", timeout))


USER_STATS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])

USER_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s", DoubleType()),
    StructField("mx", DoubleType()),
])


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over a stream with columns
    (user_id, value); one output row per user per micro-batch in which
    the user appeared — monotonically growing scalars, O(1) state per
    key."""
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["value"].astype(float)
            n += len(vals)
            s += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((int(n), float(s), float(mx)))
        yield pd.DataFrame({"user_id": [int(key[0])], "n_events": [n],
                            "total_value": [s], "max_value": [mx]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, USER_STATS_SCHEMA, USER_STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def streaming_dedup_native(df: DataFrame, key_cols: list[str],
                           ts_col: str = "ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """Engine-native streaming dedup: dropDuplicatesWithinWatermark
    keeps each key's first arrival and ages state out with the
    watermark — the JVM/RocksDB-state-store scale path, preferred over
    :func:`streaming_dedup` (Python state) when no custom per-key
    logic is needed. State size is bounded by keys seen within one
    watermark horizon instead of a TTL scan."""
    return (df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(key_cols))


SEQ_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("seq", LongType()),
])

SEQ_STATE_SCHEMA = StructType([StructField("next_seq", LongType())])


def stateful_sequence(events: DataFrame) -> DataFrame:
    """Per-key monotonically increasing sequence numbers ACROSS
    micro-batches (input columns: user_id, event_id): event i of a
    user gets seq = lifetime position, regardless of which batch it
    arrived in — the event-ordering primitive behind per-entity
    changelogs and exactly-once downstream merges. Within a batch,
    rows order by event_id so the assignment is deterministic.

    State is one int64 per key — O(keys) total, partitioned by the
    grouping shuffle like all GroupState."""
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        nxt = state.get[0] if state.exists else 0
        out_ids, out_seqs = [], []
        for pdf in pdfs:
            for eid in sorted(int(x) for x in pdf["event_id"]):
                out_ids.append(eid)
                out_seqs.append(nxt)
                nxt += 1
        state.update((int(nxt),))
        yield pd.DataFrame({"user_id": [int(key[0])] * len(out_ids),
                            "event_id": out_ids, "seq": out_seqs})

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, SEQ_SCHEMA, SEQ_STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
