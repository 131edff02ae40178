"""As-of and range joins over time-ordered tables.

The reference engine processes static snapshots and has no native
as-of join; these are the time-series companions an event/training
pipeline needs (the `events` table is the driver's fixture for them).

Scale design (100 TB):

- ``asof_join`` is the union+window formulation: tag both sides, union
  by a common schema, and take ``last(payload, ignorenulls=True)`` over
  an ordered window per key. ONE shuffle on the join key, no range
  cross-product, no BroadcastNestedLoopJoin — the classic pitfall of
  expressing as-of as ``ON l.key = r.key AND r.ts <= l.ts`` + rank,
  which materializes every (probe, earlier-build-row) pair before
  pruning to rank 1. The window variant is O(n log n) per key.
- ``range_join_buckets`` turns an interval predicate into an equi-join
  on coarse time buckets: each probe row expands to the fixed number
  of candidate buckets covering its window, joins on bucket id (plus
  optional key), then applies the exact range filter. Catalyst picks a
  shuffle/sort-merge join on the bucket column; candidate fan-out is
  ``ceil(span/bucket) + 1`` rows, independent of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from data_ingest_spark.functions.stats import epoch_seconds

_SIDE = "_asof_side"
_TS = "_asof_ts"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward", tolerance_s: float | None = None,
              suffix: str = "_r", tie_break: str | None = None) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    ``direction='backward'`` matches the latest right row with
    ``right_ts <= left_ts`` (inclusive); ``'forward'`` the earliest
    with ``right_ts >= left_ts``. ``tolerance_s`` nulls out matches
    further than that many seconds away. Right columns whose names
    collide with left columns (including the timestamp) come back with
    ``suffix`` appended; the matched timestamp is always present as
    ``right_ts + suffix``. ``tie_break``: optional right column giving
    a deterministic winner among right rows with equal (key, ts) —
    highest value wins. Without it, supply a right side already unique
    per (key, ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_ts = right_ts or left_ts

    left_cols = [c for c in left.columns]
    payload = [c for c in right.columns if c not in on and c != right_ts]
    taken = set(left_cols)
    ren = {right_ts: right_ts + suffix}
    for c in payload:
        ren[c] = c + suffix if c in taken else c
    out_payload = [ren[right_ts]] + [ren[c] for c in payload]

    tb = (F.col(tie_break).cast("double") if tie_break is not None
          else F.lit(None).cast("double"))
    l_side = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("double").alias("_asof_tb"),
        *[F.col(c) for c in left_cols if c not in on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(ren[c])
          for c in [right_ts] + payload],
    )
    r_side = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tb.alias("_asof_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on],
        F.col(right_ts).alias(ren[right_ts]),
        *[F.col(c).alias(ren[c]) for c in payload],
    )
    unioned = l_side.unionByName(r_side)

    # Backward: ascending ts, right rows (side 0) before left at equal
    # ts so the match is inclusive. Forward: descending ts, same trick.
    ts_ord = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (W.partitionBy(*on)
          .orderBy(ts_ord, F.col(_SIDE).asc(), F.col("_asof_tb").asc_nulls_first())
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    matched = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias("_m_" + c)
               for c in out_payload])
    res = (matched.filter(F.col(_SIDE) == 1)
           .select(*on, F.col(_TS).alias(left_ts),
                   *[F.col(c) for c in left_cols if c not in on + [left_ts]],
                   *[F.col("_m_" + c).alias(c) for c in out_payload]))

    if tolerance_s is not None:
        gap = F.abs(epoch_seconds(left_ts)
                    - epoch_seconds(ren[right_ts]))
        keep = gap <= F.lit(float(tolerance_s))
        res = res.select(
            *on, left_ts, *[c for c in left_cols if c not in on + [left_ts]],
            *[F.when(keep, F.col(c)).alias(c) for c in out_payload])
    return res


def range_join_buckets(left: DataFrame, right: DataFrame,
                       left_ts: str = "ts", right_ts: str | None = None,
                       lower_s: float = -600.0, upper_s: float = 0.0,
                       on: list[str] | None = None,
                       bucket_s: float | None = None,
                       suffix: str = "_r") -> DataFrame:
    """Inner-join rows where ``right_ts`` falls in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds, inclusive),
    optionally also matching equality keys ``on``.

    Implemented as an equi-join on time buckets of width ``bucket_s``
    (default: the window span) — each left row explodes to the
    candidate bucket ids its window overlaps, joins on bucket equality,
    then the exact interval predicate filters survivors. Right columns
    colliding with left names get ``suffix``.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s < lower_s")
    right_ts = right_ts or left_ts
    on = on or []
    span = float(upper_s - lower_s)
    bucket = float(bucket_s if bucket_s is not None else max(span, 1.0))

    # Rename every right column (keys included) to a fresh name before
    # the join: left and right often share lineage (self-joins on the
    # same scan), and joining on same-expr-id attributes is ambiguous.
    ren = {c: c + suffix if c in left.columns else c
           for c in right.columns if c not in on}
    r = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in on],
        F.floor(epoch_seconds(right_ts) / bucket).alias("_rb"),
        *[F.col(c).alias(ren[c]) for c in ren])

    lo = F.floor((epoch_seconds(left_ts) + F.lit(float(lower_s))) / bucket)
    hi = F.floor((epoch_seconds(left_ts) + F.lit(float(upper_s))) / bucket)
    l = left.withColumn("_lb", F.explode(F.sequence(lo.cast("long"),
                                                    hi.cast("long"))))

    rt = epoch_seconds(ren[right_ts])
    lt = epoch_seconds(left_ts)
    cond = (F.col("_lb") == F.col("_rb"))
    for k in on:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    j = l.join(r, on=cond, how="inner")
    j = j.filter((rt >= lt + F.lit(float(lower_s)))
                 & (rt <= lt + F.lit(float(upper_s))))
    return j.drop("_rb", "_lb", *[f"_rk_{k}" for k in on])
