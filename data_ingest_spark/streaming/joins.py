"""Stream-stream and stream-static joins with watermark-bounded state.

Structured Streaming can join two unbounded streams only if the engine
can bound how long it must buffer each side; the interval condition
(``right_ts`` within ``[left_ts + lower_s, left_ts + upper_s]``) plus
watermarks on both sides give it exactly that — state for a row is
dropped once the other stream's watermark passes the end of its match
window. This is the streaming twin of ``operators/asof.
range_join_buckets``: the batch op buckets time to make the join an
equi-join, the streaming op lets the engine's symmetric hash join do
the bucketing in state-store keyed by the equality column.

At 100 TB/day the state store is partitioned by the join key across
executors; the watermark horizon (not the stream length) bounds state,
so sizing is ``rate × horizon``, independent of retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_stream_interval_join(
        left: DataFrame, right: DataFrame, on: str,
        left_ts: str = "ts", right_ts: str = "ts",
        lower_s: float = -600.0, upper_s: float = 0.0,
        watermark: str = "10 minutes", how: str = "inner",
        suffix: str = "_r") -> DataFrame:
    """Join two streams on an equality key plus a time interval.

    Right columns are suffixed (the two sides usually share a schema).
    ``how`` may be ``inner`` or ``leftOuter`` (outer emits the
    unmatched left row once the watermark closes its window).
    """
    lw = left.withWatermark(left_ts, watermark)
    ren = {c: c + suffix for c in right.columns}
    rw = right.select([F.col(c).alias(ren[c]) for c in right.columns]) \
        .withWatermark(ren[right_ts], watermark)
    lts, rts = F.col(left_ts), F.col(ren[right_ts])
    cond = ((F.col(on) == F.col(ren[on]))
            & (rts >= lts + F.expr(f"INTERVAL {int(lower_s)} SECONDS"))
            & (rts <= lts + F.expr(f"INTERVAL {int(upper_s)} SECONDS")))
    return lw.join(rw, cond, how)


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         on: str, how: str = "left") -> DataFrame:
    """Enrich a stream with a static dimension table (broadcast per
    micro-batch; the dimension is re-read each trigger, so slowly
    changing dims pick up updates without restarting the query)."""
    return stream.join(F.broadcast(dim), on, how)
