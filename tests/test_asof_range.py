"""asof_join / range_join_buckets unit semantics on tiny frames."""

import datetime as dt

from pyspark.sql import functions as F

from data_ingest_spark.operators.asof import asof_join, range_join_buckets


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10), 1.0), (2, "u1", _ts(30), 2.0),
         (3, "u2", _ts(5), 3.0), (4, "u3", _ts(40), 4.0)],
        "event_id long, user_id string, ts timestamp, value double")
    right = spark.createDataFrame(
        [("u1", _ts(10), 100.0), ("u1", _ts(20), 200.0),
         ("u2", _ts(7), 300.0)],
        "user_id string, ts timestamp, mark double")
    return left, right


def test_asof_backward_inclusive_and_missing(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in
           asof_join(left, right, on=["user_id"]).collect()}
    assert out[1]["mark"] == 100.0          # equal ts matches (inclusive)
    assert out[2]["mark"] == 200.0          # latest of two priors
    assert out[3]["mark"] is None           # right ts after left ts
    assert out[4]["mark"] is None           # no right rows for key
    assert out[2]["ts_r"] == _ts(20)


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in
           asof_join(left, right, on=["user_id"],
                     direction="forward").collect()}
    assert out[1]["mark"] == 100.0          # inclusive at equal ts
    assert out[2]["mark"] is None           # nothing at/after 30s
    assert out[3]["mark"] == 300.0          # 7s >= 5s


def test_asof_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: r for r in
           asof_join(left, right, on=["user_id"],
                     tolerance_s=5.0).collect()}
    assert out[1]["mark"] == 100.0          # gap 0 <= 5
    assert out[2]["mark"] is None           # gap 10 > 5 nulled
    assert out[2]["ts_r"] is None


def test_asof_tie_break_highest_wins(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(5), 1, 10.0), ("u1", _ts(5), 9, 90.0),
         ("u1", _ts(5), 4, 40.0)],
        "user_id string, ts timestamp, pick long, mark double")
    out = asof_join(left, right, on=["user_id"],
                    tie_break="pick").collect()[0]
    assert out["mark"] == 90.0


def test_range_join_buckets_matches_naive(spark):
    left, right = _frames(spark)
    got = (range_join_buckets(left, right, lower_s=-15.0, upper_s=0.0,
                              on=["user_id"])
           .select("event_id", "mark").collect())
    naive = left.join(
        right.withColumnRenamed("ts", "rts").withColumnRenamed(
            "user_id", "ruid"),
        (F.col("user_id") == F.col("ruid"))
        & (F.col("rts") >= F.col("ts") - F.expr("INTERVAL 15 SECONDS"))
        & (F.col("rts") <= F.col("ts"))).select("event_id", "mark").collect()
    assert sorted((r["event_id"], r["mark"]) for r in got) == \
        sorted((r["event_id"], r["mark"]) for r in naive)


def test_range_join_small_bucket_width(spark):
    left, right = _frames(spark)
    got = (range_join_buckets(left, right, lower_s=-15.0, upper_s=0.0,
                              on=["user_id"], bucket_s=4.0)
           .select("event_id", "mark").collect())
    assert sorted((r["event_id"], r["mark"]) for r in got) == [
        (1, 100.0), (2, 200.0)]


def test_asof_join_matches_pandas_merge_asof_hypothesis(spark):
    """Differential property: asof_join reproduces pandas.merge_asof
    (both directions, with and without tolerance) on random per-key
    event streams. The right side is generated unique per (key, ts),
    matching the documented no-tie-break contract."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from data_ingest_spark.operators.asof import asof_join

    key = st.sampled_from(["k1", "k2"])
    sec = st.integers(min_value=0, max_value=40)

    def to_pdf(rows, val):
        pdf = pd.DataFrame(rows, columns=["key", "ts", val])
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
        return pdf.sort_values(["ts", "key"]).reset_index(drop=True)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(key, sec), min_size=1, max_size=10),
           st.lists(st.tuples(key, sec), min_size=1, max_size=10))
    def run(lrows, rrows):
        rrows = list({(k, t) for k, t in rrows})  # unique per (key, ts)
        lpdf = to_pdf([(k, t, float(i)) for i, (k, t) in enumerate(lrows)],
                      "lv")
        rpdf = to_pdf([(k, t, float(i)) for i, (k, t) in enumerate(rrows)],
                      "rv")
        ldf = spark.createDataFrame(lpdf).withColumnRenamed("ts", "ts")
        rdf = spark.createDataFrame(rpdf)
        for direction in ("backward", "forward"):
            for tol in (None, 5.0):
                exp = pd.merge_asof(
                    lpdf, rpdf, on="ts", by="key", direction=direction,
                    tolerance=None if tol is None
                    else pd.Timedelta(seconds=tol))
                got = asof_join(ldf, rdf, on=["key"], left_ts="ts",
                                direction=direction,
                                tolerance_s=tol).toPandas()
                e = {(r.key, r.ts, r.lv): r.rv for r in exp.itertuples()}
                g = {(r.key, r.ts, r.lv): r.rv for r in got.itertuples()}
                assert set(e) == set(g), (direction, tol)
                for kk in e:
                    ev, gv = e[kk], g[kk]
                    both_nan = pd.isna(ev) and pd.isna(gv)
                    assert both_nan or ev == gv, (direction, tol, kk, ev, gv)

    run()
