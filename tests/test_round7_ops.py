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


def test_active_users_windows_and_gap_day(spark):
    from data_ingest_spark.extensions.profile import active_users
    rows = []
    eid = 0
    # u1 active days 0 and 2; u2 active day 0 only; day 1 is silent
    for u, day in ((1, 0), (1, 2), (2, 0)):
        rows.append((eid, BASE + day * DAY, u, "click", 1.0))
        eid += 1
    out = {str(r["day"]): r for r in active_users(_ev(spark, rows)).collect()}
    assert len(out) == 3                      # densified grid incl. day 1
    days = sorted(out)
    d0, d1, d2 = (out[d] for d in days)
    assert (d0["dau"], d0["wau"], d0["mau"]) == (2, 2, 2)
    assert (d1["dau"], d1["wau"], d1["mau"]) == (0, 2, 2)  # trailing window
    assert (d2["dau"], d2["wau"], d2["mau"]) == (1, 2, 2)
    assert d2["stickiness"] == 0.5
    assert d1["stickiness"] == 0.0


def test_power_user_curve_histogram(spark):
    from data_ingest_spark.extensions.profile import power_user_curve
    rows, eid = [], 0
    for u, ndays in ((1, 3), (2, 3), (3, 1)):
        for d in range(ndays):
            rows.append((eid, BASE + d * DAY, u, "click", 1.0))
            eid += 1
    out = {r["active_days"]: (r["n_users"], r["pct_users"])
           for r in power_user_curve(_ev(spark, rows)).collect()}
    assert out[3] == (2, round(2 / 3, 6))
    assert out[1] == (1, round(1 / 3, 6))


def test_basket_lift_independence_and_association(spark):
    from data_ingest_spark.extensions.profile import basket_lift
    rows = []
    # items 1 and 2 ALWAYS co-occur (10 baskets); item 3 in every
    # basket (20) so pairs (1,3)/(2,3) have lift 1.0
    for b in range(10):
        rows += [(b, 1), (b, 2), (b, 3)]
    for b in range(10, 20):
        rows.append((b, 3))
    df = spark.createDataFrame(rows, ["l_orderkey", "i"])
    out = {(r["item_a"], r["item_b"]): r
           for r in basket_lift(df, item=F.col("i"),
                                min_count=5).collect()}
    perfect = out[(1, 2)]
    assert perfect["n_ab"] == 10
    assert perfect["conf_a_to_b"] == 1.0
    assert perfect["lift"] == 2.0            # 10*20/(10*10)
    assert out[(1, 3)]["lift"] == 1.0        # independent of 3
    assert out[(1, 3)]["conf_a_to_b"] == 1.0
    assert out[(1, 3)]["conf_b_to_a"] == 0.5


def test_welch_ttest_matches_numpy(spark):
    import numpy as np
    from data_ingest_spark.extensions.profile import welch_ttest
    rows, eid = [], 0
    vals0 = [1.00, 2.00, 3.00, 4.00, 10.00]
    vals1 = [2.50, 2.50, 3.50, 3.00]
    for v in vals0:
        rows.append((eid, BASE + eid, 2 * eid, "click", v)); eid += 1
    for v in vals1:
        rows.append((eid, BASE + eid, 2 * eid + 1, "click", v)); eid += 1
    row = welch_ttest(_ev(spark, rows)).collect()[0]
    a = np.array([v * 100 for v in vals0])
    b = np.array([v * 100 for v in vals1])
    se0, se1 = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se0 + se1)
    df = (se0 + se1) ** 2 / (se0 ** 2 / (len(a) - 1)
                             + se1 ** 2 / (len(b) - 1))
    assert row["n0"] == 5 and row["n1"] == 4
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["welch_df"] - df) < 1e-5


def test_fleiss_kappa_matches_direct_computation(spark):
    """Differential: recompute kappa in pure python from the same
    md5-derived rating matrix."""
    import hashlib
    from data_ingest_spark.extensions.evaluation import fleiss_kappa
    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    row = fleiss_kappa(docs, n_raters=5, n_cats=3).collect()[0]
    nij = {}
    for s in range(40):
        for r in range(5):
            h = hashlib.md5(f"{s}#{r}".encode()).hexdigest()[:8]
            c = int(h, 16) % 3
            nij[(s, c)] = nij.get((s, c), 0) + 1
    N, R = 40, 5
    s2 = sum(v * v for v in nij.values())
    pbar = (s2 - N * R) / (N * R * (R - 1))
    cj = {}
    for (s, c), v in nij.items():
        cj[c] = cj.get(c, 0) + v
    pe = sum(v * v for v in cj.values()) / (N * R) ** 2
    assert row["n_subjects"] == 40
    assert abs(row["p_bar"] - pbar) < 1e-6
    assert abs(row["kappa"] - (pbar - pe) / (1 - pe)) < 1e-6


def test_bradley_terry_transitive_dominance(spark):
    from data_ingest_spark.extensions.evaluation import bradley_terry
    rows, eid = [], 0
    # every user spends A > B > C
    for u in range(6):
        for ty, v in (("A", 9.0), ("B", 5.0), ("C", 1.0)):
            rows.append((eid, BASE + eid, u, ty, v)); eid += 1
    out = {r["event_type"]: r for r in
           bradley_terry(_ev(spark, rows)).collect()}
    assert out["A"]["wins"] == 12 and out["C"]["wins"] == 0
    assert out["A"]["rating"] > out["B"]["rating"] > out["C"]["rating"]
    assert abs(sum(r["rating"] for r in out.values()) - 1.0) < 1e-5


def test_self_bleu_identical_and_disjoint(spark):
    from data_ingest_spark.extensions.evaluation import self_bleu
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "dup"),
         (2, "the cat sat on the mat", "dup"),
         (3, "alpha beta gamma delta", "dis"),
         (4, "one two three four five", "dis")],
        ["doc_id", "text", "source"])
    out = {r["source"]: r for r in self_bleu(docs).collect()}
    assert out["dup"]["mean_self_bleu2"] == 1.0
    assert out["dis"]["mean_self_bleu2"] == 0.0
    assert out["dis"]["mean_p1"] == 0.0


def test_self_bleu_brevity_penalty_linear(spark):
    from data_ingest_spark.extensions.evaluation import self_bleu
    # candidate doc 1 (4 tokens) vs reference doc 2 (8 tokens, a
    # superset): p1 = p2 = 1, BP = 4/8
    docs = spark.createDataFrame(
        [(1, "a b c d", "s"), (2, "a b c d e f g h", "s")],
        ["doc_id", "text", "source"])
    row = self_bleu(docs).collect()[0]
    assert row["mean_p1"] == 1.0 and row["mean_p2"] == 1.0
    assert row["mean_self_bleu2"] == 0.5


def test_clustering_coefficient_known_graphs(spark):
    from data_ingest_spark.operators.graph import clustering_coefficient
    # K3 (full triangle): every node cc = 1 -> bucket 9
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"])
    out = clustering_coefficient(tri).collect()
    assert len(out) == 1
    assert (out[0]["bucket"], out[0]["n_nodes"], out[0]["mean_cc"]) \
        == (9, 3, 1.0)
    # path a-b-c: only b has deg >= 2, cc = 0
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["src", "dst"])
    out = clustering_coefficient(path).collect()
    assert len(out) == 1
    assert (out[0]["bucket"], out[0]["n_nodes"], out[0]["mean_cc"]) \
        == (0, 1, 0.0)


def test_cuped_reduces_variance_on_correlated_metric(spark):
    from data_ingest_spark.extensions.profile import cuped_adjustment
    rows, eid = [], 0
    # users with persistent spend levels: pre and post both ~level,
    # so the covariate explains most between-user variance
    for u in range(40):
        level = 1.0 + (u % 10)
        for d in range(10):           # pre period (days 0..9)
            rows.append((eid, BASE + d * DAY, u, "click", level)); eid += 1
        for d in range(15, 25):       # post period
            rows.append((eid, BASE + d * DAY, u, "click",
                         level + 0.5)); eid += 1
    out = {r["arm"]: r for r in
           cuped_adjustment(_ev(spark, rows)).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r["var_ratio"] < 0.05          # near-total reduction
        assert abs(r["theta"] - 1.0) < 0.05   # post ≈ pre + const


def test_conformal_coverage_guarantee(spark):
    from data_ingest_spark.extensions.evaluation import conformal_coverage
    rows, eid = [], 0
    # deterministic spread of values per group
    for u in range(200):
        rows.append((eid, BASE + eid, u, "g", 1.0 + (u * 7 % 100) / 10))
        eid += 1
    out = conformal_coverage(_ev(spark, rows)).collect()
    r = out[0]
    assert r["n_cal"] + r["n_test"] == 200
    # split-conformal guarantee: coverage >= 1 - alpha (minus
    # discreteness slack on a 100-point test half)
    assert r["coverage"] >= 0.85
    assert r["qhat_cents"] > 0


def test_emd_drift_zero_for_identical_and_positive_for_shifted(spark):
    from data_ingest_spark.extensions.profile import emd_drift
    rows, eid = [], 0
    # type A uniform over hours 0..11, type B identical -> both emd
    # vs corpus = 0; type C all at hour 23 -> large emd
    for h in range(12):
        for ty in ("A", "B"):
            rows.append((eid, BASE + h * HOUR, eid, ty, 1.0)); eid += 1
    out = {r["event_type"]: r["emd"] for r in
           emd_drift(_ev(spark, rows)).collect()}
    assert out["A"] == 0.0 and out["B"] == 0.0
    rows += [(eid + i, BASE + 23 * HOUR, 9000 + i, "C", 1.0)
             for i in range(24)]
    out = {r["event_type"]: r["emd"] for r in
           emd_drift(_ev(spark, rows)).collect()}
    assert out["C"] > 5.0           # mass moved ~11 hours on average
    assert out["A"] == out["B"] > 0  # corpus now includes C


def test_shapley_attribution_exact_two_channels(spark):
    from data_ingest_spark.extensions.evaluation import shapley_attribution
    rows, eid = [], 0
    # 10 users touch only A: 8 convert. 10 touch only B: 2 convert.
    # v({A}) = .8, v({B}) = .2, v({}) = 0, v({A,B}) = 0 (unobserved).
    # k=2: phi_A = 1/2(v(A)-v(0)) + 1/2(v(AB)-v(B)) = .4 - .1 = .3
    #      phi_B = 1/2(v(B)-v(0)) + 1/2(v(AB)-v(A)) = .1 - .4 = -.3
    for u in range(10):
        rows.append((eid, BASE + eid, u, "A", 1.0)); eid += 1
        if u < 8:
            rows.append((eid, BASE + eid, u, "purchase", 1.0)); eid += 1
    for u in range(10, 20):
        rows.append((eid, BASE + eid, u, "B", 1.0)); eid += 1
        if u < 12:
            rows.append((eid, BASE + eid, u, "purchase", 1.0)); eid += 1
    out = {r["event_type"]: r for r in
           shapley_attribution(_ev(spark, rows)).collect()}
    assert out["A"]["shapley_credit"] == 0.3
    assert out["B"]["shapley_credit"] == -0.3
    assert out["A"]["touched_users"] == 10


def test_logreg_newton_matches_numpy_two_steps(spark):
    import numpy as np
    from data_ingest_spark.operators.regression import logreg_newton2
    rng = np.random.RandomState(7)
    n = 800
    x = rng.uniform(0, 8, n)
    pp = 1 / (1 + np.exp(-(-1.5 + 0.5 * x)))
    yy = (rng.uniform(size=n) < pp).astype(int)
    vals = (np.exp(x) - 1) / 100.0
    rows = [(i, BASE + i, i, "purchase" if t else "click", float(v))
            for i, (v, t) in enumerate(zip(vals, yy))]
    out = logreg_newton2(_ev(spark, rows)).collect()[0]
    cents = np.floor(vals * 100 + 0.5)
    xx = np.floor(np.log(1.0 + cents) * 1e6 + 0.5) / 1e6
    X = np.stack([np.ones_like(xx), xx], 1)
    b = np.zeros(2)
    for _ in range(2):
        p = 1 / (1 + np.exp(-(X @ b)))
        b = b + np.linalg.solve(X.T @ (X * (p * (1 - p))[:, None]),
                                X.T @ (yy - p))
    assert out["n"] == n and out["n_pos"] == int(yy.sum())
    assert abs(out["beta0"] - b[0]) < 1e-4
    assert abs(out["beta1"] - b[1]) < 1e-4


def test_holt_forecast_exact_linear_series(spark):
    """On an exactly linear hourly series (c_t = 5 + 2t) Holt locks on
    immediately: level tracks the line, trend -> 2, one-step MAE = 0
    (init b0 = c1 - c0 = 2 makes every walk-forward forecast exact)."""
    from data_ingest_spark.extensions.profile import holt_forecast
    rows, eid = [], 0
    for t in range(48):
        for _ in range(5 + 2 * t):
            rows.append((eid, BASE + t * HOUR, eid, "lin", 1.0)); eid += 1
    out = holt_forecast(_ev(spark, rows)).collect()[0]
    assert out["n_hours"] == 48
    assert out["mae_1step"] == 0.0
    assert out["trend"] == 2.0
    assert out["level"] == 5.0 + 2.0 * 47
    assert out["forecast_next"] == out["level"] + 2.0


def test_holt_forecast_matches_python_fold(spark):
    """Differential: replicate the quantized fold in pure python on a
    deterministic bumpy series."""
    from data_ingest_spark.extensions.profile import holt_forecast
    series = [(i * 7) % 13 + 1 for i in range(36)]
    rows, eid = [], 0
    for t, c in enumerate(series):
        for _ in range(c):
            rows.append((eid, BASE + t * HOUR, eid, "x", 1.0)); eid += 1
    out = holt_forecast(_ev(spark, rows)).collect()[0]

    def q9(x):
        import math
        return math.floor(x * 1e9 + 0.5) / 1e9

    l, b, e = float(series[0]), q9(series[1] - series[0]), 0.0
    for y in series[1:]:
        pred = l + b
        e = q9(e + abs(y - pred))
        l_new = q9(0.2 * y + (1.0 - 0.2) * pred)
        b = q9(0.1 * (l_new - l) + (1.0 - 0.1) * b)
        l = l_new
    assert out["level"] == round(l, 6)
    assert out["trend"] == round(b, 6)
    # n−2: the first fold step's error is structurally zero (b0 =
    # y2−y1 makes pred = y2), so only n−2 steps are predictive
    assert out["mae_1step"] == round(e / (len(series) - 2), 6)


def test_mann_kendall_monotone_and_flat(spark):
    from data_ingest_spark.extensions.profile import mann_kendall
    rows, eid = [], 0
    # strictly increasing hourly counts -> S = n(n-1)/2, large +z
    for t in range(24):
        for _ in range(t + 1):
            rows.append((eid, BASE + t * HOUR, eid, "up", 1.0)); eid += 1
    # constant counts -> S = 0, z = 0 (all one tie group)
    for t in range(24):
        for _ in range(3):
            rows.append((eid, BASE + t * HOUR, eid, "flat", 1.0)); eid += 1
    out = {r["event_type"]: r for r in
           mann_kendall(_ev(spark, rows)).collect()}
    n = 24
    assert out["up"]["s_stat"] == n * (n - 1) // 2
    assert out["up"]["z"] > 4.0
    assert out["flat"]["s_stat"] == 0
    assert out["flat"]["z"] == 0.0
    # all-tied variance term zeroes the tie-corrected Var(S)
    assert out["flat"]["var_s"] == 0.0


def test_degree_assortativity_known_graphs(spark):
    from data_ingest_spark.operators.graph import degree_assortativity
    # star graph: perfect disassortativity, r = -1
    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], ["src", "dst"])
    row = degree_assortativity(star).collect()[0]
    assert row["n_edges"] == 5
    assert row["assortativity"] == -1.0
    # two disjoint edges: all degrees equal -> correlation undefined
    # (zero variance) -> NULL, not a crash
    pair = spark.createDataFrame(
        [("a", "b"), ("c", "d")], ["src", "dst"])
    row = degree_assortativity(pair).collect()[0]
    assert row["n_edges"] == 2
    assert row["assortativity"] is None


def test_bradley_terry_matches_python_mm_fold(spark):
    """Differential: replicate the quantized 2-iteration MM update in
    pure python from the same duel matrix."""
    import math
    from collections import defaultdict
    from data_ingest_spark.extensions.evaluation import bradley_terry
    rows, eid = [], 0
    spend = {"A": [9, 3, 7, 9, 2, 8], "B": [5, 6, 5, 1, 6, 4],
             "C": [1, 8, 2, 3, 9, 1]}
    for u in range(6):
        for ty in spend:
            rows.append((eid, BASE + eid, u, ty, float(spend[ty][u])))
            eid += 1
    out = {r["event_type"]: r for r in
           bradley_terry(_ev(spark, rows)).collect()}

    # python mirror
    items = sorted(spend)
    w = defaultdict(int)
    for u in range(6):
        for i in items:
            for j in items:
                if i < j and spend[i][u] != spend[j][u]:
                    if spend[i][u] > spend[j][u]:
                        w[(i, j)] += 1
                    else:
                        w[(j, i)] += 1
    n = {(i, j): w[(i, j)] + w[(j, i)] for i in items for j in items
         if i != j}
    wins = {i: sum(w[(i, j)] for j in items if j != i) for i in items}
    p = {i: 1.0 for i in items}
    for _ in range(2):
        terms = {i: sum(math.floor(n[(i, j)] / (p[i] + p[j]) * 1e9 + 0.5)
                        for j in items if j != i and n[(i, j)] > 0)
                 for i in items}
        p = {i: math.floor(wins[i] * 1e9 / (terms[i] / 1e9) + 0.5) / 1e9
             for i in items}
    tot = sum(p.values())
    for i in items:
        assert out[i]["wins"] == wins[i]
        assert out[i]["rating"] == round(p[i] / tot, 6)


def test_self_bleu_matches_python_mirror(spark):
    """Differential: clipped n-gram precision + linear BP in pure
    python on a 3-doc group."""
    import math
    from collections import Counter
    from data_ingest_spark.extensions.evaluation import self_bleu
    texts = ["the cat sat on the mat today",
             "the cat sat on a mat",
             "a dog sat on the mat and the cat sat too"]
    docs = spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"])
    row = self_bleu(docs).collect()[0]

    def grams(toks, nn):
        return Counter(tuple(toks[i:i + nn])
                       for i in range(len(toks) - nn + 1))

    fp1 = fp2 = fb = 0
    for cand, ref in zip(texts[:-1], texts[1:]):
        c, r = cand.lower().split(), ref.lower().split()
        ps = []
        for nn in (1, 2):
            gc, gr = grams(c, nn), grams(r, nn)
            clip = sum(min(v, gr.get(g, 0)) for g, v in gc.items())
            ps.append(clip / sum(gc.values()))
        bp = 1.0 if len(c) >= len(r) else len(c) / len(r)
        q = lambda x: math.floor(x * 1e6 + 0.5)  # noqa: E731
        fp1 += q(ps[0]); fp2 += q(ps[1])
        fb += q(bp * math.sqrt(ps[0] * ps[1]))
    np_ = len(texts) - 1
    assert row["n_pairs"] == np_
    assert row["mean_p1"] == round(fp1 / 1e6 / np_, 6)
    assert row["mean_p2"] == round(fp2 / 1e6 / np_, 6)
    assert row["mean_self_bleu2"] == round(fb / 1e6 / np_, 6)


def test_qte_deciles_known_shift(spark):
    """Treatment = control + constant 100-cent shift per user: every
    decile QTE is exactly 100 cents (bit-exact ints)."""
    from data_ingest_spark.extensions.profile import qte_deciles
    rows, eid = [], 0
    for i in range(40):
        # control users (even ids): totals 1.00, 2.00, ... dollars
        rows.append((eid, BASE + eid, 2 * i, "e", float(i + 1))); eid += 1
        # treatment (odd ids): same ladder + 1 dollar
        rows.append((eid, BASE + eid, 2 * i + 1, "e", float(i + 2))); eid += 1
    out = {r["decile"]: r for r in qte_deciles(_ev(spark, rows)).collect()}
    assert len(out) == 9
    for d, r in out.items():
        assert r["qte_cents"] == 100
        assert r["q_treat_cents"] - r["q_control_cents"] == 100


def test_nb_dispersion_poisson_vs_overdispersed(spark):
    from data_ingest_spark.extensions.profile import nb_dispersion
    rows, eid = [], 0
    # constant 4/hour -> var 0, dispersion 0, no NB fit
    for t in range(24):
        for _ in range(4):
            rows.append((eid, BASE + t * HOUR, eid, "flat", 1.0)); eid += 1
    # bursty: alternating 0 and 8 -> mean 4, var > mean -> NB defined
    for t in range(24):
        for _ in range(8 if t % 2 == 0 else 0):
            rows.append((eid, BASE + t * HOUR, eid, "burst", 1.0)); eid += 1
    out = {r["event_type"]: r for r in
           nb_dispersion(_ev(spark, rows)).collect()}
    assert out["flat"]["var_per_hour"] == 0.0
    assert out["flat"]["nb_r"] is None
    b = out["burst"]
    assert b["mean_per_hour"] == 4.0
    assert b["dispersion_index"] > 1.0
    assert b["nb_r"] is not None and b["nb_p"] < 1.0


def test_diff_in_diff_planted_effect(spark):
    """Both arms trend +2.00 pre->post; treatment gets an EXTRA +3.00
    in the post period: DiD = 300 cents exactly."""
    from data_ingest_spark.extensions.profile import diff_in_diff
    rows, eid = [], 0
    for u in range(20):
        treat = u % 2 == 1
        rows.append((eid, BASE + 1 * DAY, u, "e", 5.0)); eid += 1
        post = 5.0 + 2.0 + (3.0 if treat else 0.0)
        rows.append((eid, BASE + 20 * DAY, u, "e", post)); eid += 1
    r = diff_in_diff(_ev(spark, rows)).collect()[0]
    assert r["n_treat"] == 10 and r["n_control"] == 10
    assert r["did_cents"] == 300.0
    assert r["control_post"] - r["control_pre"] == 200.0


def test_welch_ttest_degenerate_arms_yield_null_not_inf(spark):
    """The kaplan-meier ln(0) divergence class, applied proactively
    (round-7 verdict #4): a 1-row arm has undefined variance and two
    constant arms an undefined t — both must surface as NULL, never
    ±inf/NaN, and identically in the DuckDB oracle's CASE guard."""
    from data_ingest_spark.extensions.profile import welch_ttest
    # arm 0 (even users): one row -> n-1 = 0
    rows = [(0, BASE, 0, "e", 5.0),
            (1, BASE + 1, 1, "e", 3.0), (2, BASE + 2, 3, "e", 4.0)]
    r = welch_ttest(_ev(spark, rows)).collect()[0]
    assert r["n0"] == 1 and r["n1"] == 2
    assert r["t_stat"] is None and r["welch_df"] is None
    assert r["mean_cents_0"] == 500.0
    # both arms constant -> se0+se1 == 0 -> t undefined
    rows = [(0, BASE, 0, "e", 2.0), (1, BASE + 1, 2, "e", 2.0),
            (2, BASE + 2, 1, "e", 7.0), (3, BASE + 3, 3, "e", 7.0)]
    r = welch_ttest(_ev(spark, rows)).collect()[0]
    assert r["t_stat"] is None and r["welch_df"] is None


def test_cuped_degenerate_single_user_arm_and_zero_var_x(spark):
    from data_ingest_spark.extensions.profile import cuped_adjustment
    # 3 users (one arm gets a single user); pre-period X identical
    # for all users -> var(X) = 0 -> theta undefined -> NULL theta
    # and NULL adjusted columns; the single-user arm additionally has
    # undefined var(Y) -> NULL var_ratio. Raw means stay exact.
    rows, eid = [], 0
    for u in [0, 1, 2]:
        rows.append((eid, BASE, u, "e", 4.0)); eid += 1            # pre
        rows.append((eid, BASE + 20 * DAY, u, "e", 1.0 + u)); eid += 1
    out = {r["arm"]: r for r in
           cuped_adjustment(_ev(spark, rows)).collect()}
    assert out[0]["n_users"] == 2 and out[1]["n_users"] == 1
    for r in out.values():
        assert r["theta"] is None
        assert r["mean_cents_adj"] is None
    assert out[1]["var_ratio"] is None          # n-1 = 0 arm
    assert out[0]["mean_cents"] == 200.0        # (100+300)/2 post cents


def test_diff_in_diff_empty_post_cell_is_zero_mean(spark):
    """No post-period events at all: post sums are 0 (the otherwise(0)
    arm of the conditional sum), so all post means and the DiD are
    exactly 0 — never NULL or an error."""
    from data_ingest_spark.extensions.profile import diff_in_diff
    rows = [(i, BASE + i, u, "e", 2.0)
            for i, u in enumerate([0, 1, 2, 3])]
    r = diff_in_diff(_ev(spark, rows)).collect()[0]
    assert r["treat_post"] == 0.0 and r["control_post"] == 0.0
    assert r["did_cents"] == 0.0


def test_diff_in_diff_missing_arm_yields_empty_frame(spark):
    """Only even (control) users present: the treat slice is empty and
    the 1-row cross join produces ZERO rows — the documented contract
    (schema-stable empty result, not a fabricated row)."""
    from data_ingest_spark.extensions.profile import diff_in_diff
    rows = [(i, BASE + i, 2 * i, "e", 1.0) for i in range(4)]
    out = diff_in_diff(_ev(spark, rows))
    assert out.count() == 0
    assert set(out.columns) == {"n_treat", "n_control", "treat_pre",
                                "treat_post", "control_pre",
                                "control_post", "did_cents"}


def test_holt_forecast_two_hours_mae_null(spark):
    """n = 2: the only fold step is the structurally-zero first one,
    so mae_1step is NULL (n-2 = 0 predictive steps) while level/trend
    are still defined."""
    from data_ingest_spark.extensions.profile import holt_forecast
    rows, eid = [], 0
    for t, c in [(0, 3), (1, 5)]:
        for _ in range(c):
            rows.append((eid, BASE + t * HOUR, eid, "x", 1.0)); eid += 1
    r = holt_forecast(_ev(spark, rows)).collect()[0]
    assert r["n_hours"] == 2
    assert r["mae_1step"] is None
    assert r["trend"] == 2.0
