"""E family: event-stream windows, sessionization, as-of joins, range counts, SCD2/CDC shapes.

Split from the monolithic harness/registry.py in round 6 (review-
size ask); registration order and content unchanged. The shared
``_q`` decorator writes into registry.REGISTRY at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from data_ingest_spark.operators import (emptydrops as ed, filters as fl,
                                         joins as jn, merge as mg,
                                         metrics as mx, normalize as nz,
                                         regression as rg, windows as wd)

from data_ingest_spark.harness.registry import (_q, load, expr_df,
                                                events_df, _EXPR_SQL)

# ------------------------------------------------- E: event-stream windows




@_q("e1_tumbling_window", """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total_value
FROM (SELECT event_type, value, ts::TIMESTAMP AS ts FROM events) GROUP BY 1, 2
""")
def q_tumbling(spark, sf):
    ev = events_df(spark, sf)
    return ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select(F.col("w.start").alias("window_start"), "event_type", "n",
             "total_value")


@_q("e2_sliding_window", """
WITH b AS (SELECT event_type, value,
                  make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)
                                 * 1000000) AS b30
           FROM (SELECT event_type, value, ts::TIMESTAMP AS ts FROM events)),
 w AS (SELECT event_type, value,
              unnest([b30, b30 - INTERVAL 30 MINUTE]) AS window_start
       FROM b)
SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM w GROUP BY 1, 2
""")
def q_sliding(spark, sf):
    ev = events_df(spark, sf)
    return ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select(F.col("w.start").alias("window_start"), "event_type", "n",
             "total_value")


@_q("e3_session_window", """
WITH o AS (SELECT user_id, ts, value,
                  CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS brk
           FROM (SELECT user_id, value, ts::TIMESTAMP AS ts FROM events)
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
 s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
       FROM o)
SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM s GROUP BY user_id, sid
""")
def q_session(spark, sf):
    ev = events_df(spark, sf)
    return ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    ).select("user_id", F.col("w.start").alias("session_start"), "n",
             "total_value")


@_q("e4_asof_join", """
WITH l AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
           FROM events WHERE event_type = 'purchase'),
 r AS (SELECT user_id, ts::TIMESTAMP AS ts, MAX(value) AS signup_value
       FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
 j AS (SELECT l.event_id, l.user_id, l.ts, l.value,
              r.ts AS signup_ts, r.signup_value,
              ROW_NUMBER() OVER (PARTITION BY l.event_id
                                 ORDER BY r.ts DESC) AS rn
       FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
SELECT event_id, user_id, ts, value, signup_ts, signup_value,
       CAST(date_diff('second', signup_ts, ts) AS BIGINT) AS lag_s
FROM j WHERE rn = 1
""")
def q_asof_join(spark, sf):
    """As-of join: each purchase ⟵ the user's latest signup at-or-before
    it. Spark side is the single-shuffle union+window operator
    (operators/asof.py); the oracle is the naive rank-over-range-join
    formulation — different plan, same semantics."""
    from data_ingest_spark.operators.asof import asof_join
    ev = events_df(spark, sf)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    right = (ev.filter(F.col("event_type") == "signup")
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("signup_value")))
    res = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="ts", suffix="_signup")
    return res.select(
        "event_id", "user_id", "ts", "value",
        F.col("ts_signup").alias("signup_ts"), "signup_value",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_signup"))
        .cast("long").alias("lag_s"))


@_q("e5_range_count", """
WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
           FROM events),
 l AS (SELECT event_id, user_id, ts FROM e
       WHERE event_id % 7 = 0),
 m AS (SELECT l.event_id, CAST(COUNT(*) AS BIGINT) AS n_prior,
              ROUND(SUM(r.value), 2) AS prior_value
       FROM l JOIN e r
         ON l.user_id = r.user_id
        AND r.ts >= l.ts - INTERVAL 10 MINUTE AND r.ts <= l.ts
        AND r.event_id <> l.event_id
       GROUP BY 1)
SELECT l.event_id, l.user_id, l.ts,
       COALESCE(m.n_prior, 0) AS n_prior,
       COALESCE(m.prior_value, 0.0) AS prior_value
FROM l LEFT JOIN m ON l.event_id = m.event_id
""")
def q_range_count(spark, sf):
    """Bucketed range join: for each probe event (every 7th), count and
    sum same-user events in the trailing 10 minutes. Spark side expands
    probes to candidate 10-minute buckets and equi-joins (no
    BroadcastNestedLoop); oracle is the naive interval join."""
    from data_ingest_spark.operators.asof import range_join_buckets
    ev = events_df(spark, sf).select("event_id", "user_id", "ts", "value")
    probes = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "user_id", "ts")
    j = range_join_buckets(probes, ev, left_ts="ts", right_ts="ts",
                           lower_s=-600.0, upper_s=0.0, on=["user_id"])
    m = (j.filter(F.col("event_id_r") != F.col("event_id"))
         .groupBy("event_id")
         .agg(F.count("*").alias("n_prior"),
              F.round(F.sum("value"), 2).alias("prior_value")))
    return (probes.join(m, "event_id", "left")
            .select("event_id", "user_id", "ts",
                    F.coalesce("n_prior", F.lit(0)).alias("n_prior"),
                    F.coalesce("prior_value", F.lit(0.0))
                    .alias("prior_value")))


@_q("e6_rollup", """
WITH b AS (SELECT CAST(ts::TIMESTAMP::DATE AS VARCHAR) AS day,
                  event_type, value FROM events)
SELECT COALESCE(day, 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       CAST(COUNT(value) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total_value
FROM b GROUP BY ROLLUP(day, event_type)
""")
def q_rollup(spark, sf):
    """Hierarchical rollup (day, event_type) → day → grand total in one
    pass — Spark's ROLLUP grouping sets, map-side combinable."""
    ev = events_df(spark, sf).withColumn(
        "day", F.col("ts").cast("date").cast("string"))
    return (ev.rollup("day", "event_type")
            .agg(F.count("value").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.coalesce("day", F.lit("ALL")).alias("day"),
                    F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
                    "n", "total_value"))


@_q("e7_pivot", """
SELECT user_id,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
       CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
       CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
       CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
       CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view,
       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
           AS purchase_value
FROM events GROUP BY user_id
""")
def q_pivot(spark, sf):
    """Wide pivot of event counts per user. Explicit value list keeps it
    a single-pass pivot (no extra distinct scan to discover columns)."""
    ev = events_df(spark, sf)
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = (ev.groupBy("user_id").pivot("event_type", kinds).count())
    pv = (ev.filter(F.col("event_type") == "purchase")
          .groupBy("user_id")
          .agg(F.round(F.sum("value"), 2).alias("purchase_value")))
    out = piv.join(pv, "user_id", "left")
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(f"n_{k}")
          for k in kinds],
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"))


@_q("e8_percentiles", """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       ROUND(AVG(value), 6) AS mean_value
FROM events GROUP BY event_type
""")
def q_percentiles(spark, sf):
    """Exact linear-interpolation percentiles per group — Spark's
    `percentile` and DuckDB's `quantile_cont` agree bit-for-bit at 6dp.
    (At 100 TB you'd switch to approx_percentile; the exact form is the
    correctness anchor the sketch is judged against.)"""
    ev = events_df(spark, sf)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.round(F.avg("value"), 6).alias("mean_value"))


@_q("e9_multires_rollup", """
SELECT CAST(ts::TIMESTAMP::DATE AS VARCHAR) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
""")
def q_multires_rollup(spark, sf):
    """Hypertable-style rollup reuse: the daily aggregate is derived
    from the HOURLY rollup (sum of partial sums + sum of counts), not
    from raw events — the incremental-aggregation contract that lets a
    100 TB store keep only coarse tiers hot. The oracle computes daily
    from raw, proving the reaggregation is lossless. Rounding happens
    only at the final tier (partials stay exact doubles)."""
    ev = events_df(spark, sf)
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                         "event_type")
              .agg(F.count("*").alias("n"), F.sum("value").alias("sv")))
    return (hourly.groupBy(
        F.col("hour").cast("date").cast("string").alias("day"),
        "event_type")
        .agg(F.sum("n").alias("n"),
             F.round(F.sum("sv"), 2).alias("total_value")))


@_q("e10_running_stats", """
SELECT event_id, user_id, ts,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS n_so_far,
       ROUND(SUM(value) OVER w, 2) AS value_so_far,
       ROUND(value - LAG(value) OVER w, 2) AS delta_prev,
       CAST(date_diff('second', LAG(ts::TIMESTAMP) OVER w, ts::TIMESTAMP)
            AS BIGINT) AS gap_s
FROM (SELECT event_id, user_id, value, ts::TIMESTAMP AS ts FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_running_stats(spark, sf):
    """Per-user running aggregates + lag deltas in one window pass
    (partitioned by user — parallel, no global window)."""
    ev = events_df(spark, sf)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "event_id", "user_id", "ts",
        F.row_number().over(w).cast("long").alias("n_so_far"),
        F.round(F.sum("value").over(wf), 2).alias("value_so_far"),
        F.round(F.col("value") - F.lag("value").over(w), 2)
        .alias("delta_prev"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("long").alias("gap_s"))


@_q("e11_funnel", """
WITH s AS (SELECT user_id, MIN(ts::TIMESTAMP) AS t_signup FROM events
           WHERE event_type = 'signup' GROUP BY 1),
 c AS (SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS t_click
       FROM events e JOIN s ON e.user_id = s.user_id
       WHERE e.event_type = 'click' AND e.ts::TIMESTAMP > s.t_signup
       GROUP BY 1),
 p AS (SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS t_purchase
       FROM events e JOIN c ON e.user_id = c.user_id
       WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > c.t_click
       GROUP BY 1)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after
""")
def q_funnel(spark, sf):
    """Ordered funnel: signup → later click → later purchase. Each
    stage is a min-timestamp aggregate joined to the previous stage —
    three shuffles keyed by user, no window over the full stream."""
    ev = events_df(spark, sf).select("user_id", "event_type", "ts")
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t_signup")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(s, "user_id")
         .filter(F.col("ts") > F.col("t_signup"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    return (s.agg(F.count("*").alias("n_signup"))
            .crossJoin(c.agg(F.count("*").alias("n_click_after")))
            .crossJoin(p.agg(F.count("*").alias("n_purchase_after"))))


@_q("e12_cohort_retention", """
WITH s AS (SELECT user_id,
                  date_trunc('week', MIN(ts::TIMESTAMP)) AS cohort_week
           FROM events WHERE event_type = 'signup' GROUP BY 1),
 a AS (SELECT e.user_id, s.cohort_week,
              CAST(date_diff('week', s.cohort_week,
                             date_trunc('week', e.ts::TIMESTAMP))
                   AS BIGINT) AS week_offset
       FROM events e JOIN s ON e.user_id = s.user_id
       WHERE e.ts::TIMESTAMP >= s.cohort_week)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM a GROUP BY 1, 2
""")
def q_cohort_retention(spark, sf):
    """Cohort retention triangle: users bucketed by first-signup week,
    counted distinct per week offset of any later activity."""
    ev = events_df(spark, sf)
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id")
         .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    a = (ev.join(s, "user_id")
         .filter(F.col("ts") >= F.col("cohort_week"))
         .select("user_id", "cohort_week",
                 ((F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                   - F.unix_timestamp("cohort_week"))
                  / (7 * 86400)).cast("long").alias("week_offset")))
    return (a.groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("active_users")))


