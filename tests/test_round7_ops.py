"""Unit tests for the round-7 operator batch: RFM segmentation,
Markov transitions, session-path mining, pass@k, calibration ECE,
Bloom decontamination, Benford audit — known-value examples plus the
differential/property checks the round-6 test program standardized."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

BASE = 1_700_000_000_000_000
DAY = 86_400_000_000
HOUR = 3_600_000_000


def _ev(spark, rows):
    """rows: (event_id, us, user_id, event_type, value)."""
    df = spark.createDataFrame(
        rows, ["event_id", "us", "user_id", "event_type", "value"])
    return df.select("event_id",
                     F.timestamp_micros(F.col("us")).alias("ts"),
                     "user_id", "event_type",
                     F.col("value").cast("double").alias("value"))


def test_rfm_segments_known_tiles(spark):
    from data_ingest_spark.extensions.profile import rfm_segments
    rows, eid = [], 0
    # 3 users: u1 recent+busy+rich, u2 middle, u3 stale+quiet+poor
    spec = {1: (9, 30, 100.0), 2: (5, 10, 10.0), 3: (0, 2, 1.0)}
    for u, (day, n, v) in spec.items():
        for i in range(n):
            rows.append((eid, BASE + day * DAY + i, u, "click", v))
            eid += 1
    out = rfm_segments(_ev(spark, rows)).collect()
    seg = {(r["r"], r["f"], r["m"]): (r["n_users"], r["total_cents"])
           for r in out}
    # u1: best on all three axes; u3 worst on all three
    assert seg[(1, 1, 1)] == (1, 30 * 10000)
    assert seg[(2, 2, 2)] == (1, 10 * 1000)
    assert seg[(3, 3, 3)] == (1, 2 * 100)


def test_markov_transitions_probabilities(spark):
    from data_ingest_spark.extensions.profile import markov_transitions
    # one user: a a b a a b -> from a: a->a x2, a->b x2 ... build
    # explicit: sequence a a b a b gives pairs aa, ab, ba, ab
    seq = ["a", "a", "b", "a", "b"]
    rows = [(i, BASE + i, 1, t, 0.0) for i, t in enumerate(seq)]
    out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in markov_transitions(_ev(spark, rows)).collect()}
    assert out[("a", "a")] == (1, round(1 / 3, 6))
    assert out[("a", "b")] == (2, round(2 / 3, 6))
    assert out[("b", "a")] == (1, 1.0)


def test_session_paths_split_and_truncation(spark):
    from data_ingest_spark.extensions.evaluation import session_paths
    rows, eid = [], 0
    # u1: two sessions split by > 30 min; second session exceeds
    # max_steps and truncates
    for i, t in enumerate(["view", "click"]):
        rows.append((eid, BASE + i, 1, t, 0.0)); eid += 1
    for i in range(10):
        rows.append((eid, BASE + 2 * HOUR + i, 1, "view", 0.0)); eid += 1
    # u2: one session identical to u1's first
    for i, t in enumerate(["view", "click"]):
        rows.append((eid, BASE + i, 2, t, 0.0)); eid += 1
    out = {r["path"]: r["n_sessions"]
           for r in session_paths(_ev(spark, rows), max_steps=8).collect()}
    assert out["view>click"] == 2
    assert out[">".join(["view"] * 8)] == 1
    assert len(out) == 2


def test_pass_at_k_matches_closed_form(spark):
    from data_ingest_spark.extensions.evaluation import pass_at_k
    # one task, n=10 attempts, c=3 successes: pass@k = 1 - C(7,k)/C(10,k)
    rows = [(i, BASE + i, 1, "try", 99.0 if i < 3 else 1.0)
            for i in range(10)]
    out = {r["k"]: r["mean_pass_at_k"]
           for r in pass_at_k(_ev(spark, rows), ks=(1, 5, 10)).collect()}
    def closed(n, c, k):
        return 1.0 - math.comb(n - c, k) / math.comb(n, k)
    assert out[1] == round(closed(10, 3, 1), 6)
    assert out[5] == round(closed(10, 3, 5), 6)
    assert out[10] == 1.0          # n - c < k -> certain pass


def test_pass_at_k_skips_small_tasks(spark):
    from data_ingest_spark.extensions.evaluation import pass_at_k
    # task 1 has 2 attempts -> excluded from k=5; task 2 has 6
    rows = [(0, BASE, 1, "t", 99.0), (1, BASE + 1, 1, "t", 1.0)]
    rows += [(2 + i, BASE + 2 + i, 2, "t", 1.0) for i in range(6)]
    out = {r["k"]: (r["n_tasks"], r["mean_pass_at_k"])
           for r in pass_at_k(_ev(spark, rows), ks=(1, 5)).collect()}
    assert out[1][0] == 2
    assert out[5] == (1, 0.0)      # only task 2; zero successes


def test_calibration_ece_perfect_and_off(spark):
    from data_ingest_spark.extensions.evaluation import calibration_ece
    rows, eid = [], 0
    # bin 9 (conf 0.95): 20 events, 19 purchases -> acc 0.95, gap 0
    for i in range(20):
        t = "purchase" if i < 19 else "view"
        rows.append((eid, BASE + eid, 1, t, 95.0)); eid += 1
    # bin 0 (conf 0.05): 20 events, 10 purchases -> gap 0.45
    for i in range(20):
        t = "purchase" if i < 10 else "view"
        rows.append((eid, BASE + eid, 2, t, 5.0)); eid += 1
    out = {r["bin"]: r for r in calibration_ece(_ev(spark, rows)).collect()}
    assert out[9]["mean_conf"] == 0.95 and out[9]["accuracy"] == 0.95
    assert out[9]["gap"] == 0.0
    assert out[0]["gap"] == 0.45
    assert out[0]["ece_contrib"] == 0.225      # 20/40 * 0.45


def test_bloom_decontaminate_flags_planted_overlap(spark):
    from data_ingest_spark.extensions.dedup import (bloom_contaminate,
                                                    decontaminate)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma zeta eta"),        # shares 1 shingle
         (2, "one two three four five")],          # disjoint
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           bloom_contaminate(corpus, bench).collect()}
    assert out[1]["contaminated"] and out[1]["n_flagged"] >= 1
    # FP-rate sanity vs the exact join: the planted hit must also be
    # exact; doc 2 may only differ by a (vanishingly unlikely at
    # m=2^20) false positive
    exact = {r["doc_id"] for r in
             decontaminate(corpus, bench).collect()}
    assert 1 in exact
    assert not out[2]["contaminated"]
    assert out[1]["n_shingles"] == 3 and out[2]["n_shingles"] == 3


def test_benford_exact_digit_census(spark):
    from data_ingest_spark.extensions.profile import (BENFORD_P,
                                                      benford_deviation)
    # values whose cent strings lead with digits 1,1,2,9
    rows = [(0, BASE, 1, "a", 1.23), (1, BASE + 1, 1, "a", 150.0),
            (2, BASE + 2, 1, "a", 0.25), (3, BASE + 3, 1, "a", 9.99)]
    out = {r["digit"]: r for r in
           benford_deviation(_ev(spark, rows)).collect()}
    assert out[1]["observed"] == 2
    assert out[2]["observed"] == 1 and out[9]["observed"] == 1
    assert out[1]["expected"] == round(4 * BENFORD_P[0], 6)
    # zero/negative cents are excluded from the census
    rows.append((4, BASE + 4, 1, "a", 0.0))
    out2 = benford_deviation(_ev(spark, rows)) \
        .agg(F.sum("observed")).collect()[0][0]
    assert out2 == 4
