"""Semantics tests for the round-4 operator batch: RRF fusion, URL
canonicalization, JL sign projection, KS drift, per-doc keywords, and
temperature mixing. Each operator also carries a full DuckDB value
oracle in the registry (x93–x98); these tests pin the *semantics* on
hand-constructed micro-inputs where the expected answer is obvious."""

import math

import pyspark.sql.functions as F
import pytest

from data_ingest_spark.extensions.evaluation import rrf_fuse
from data_ingest_spark.extensions.packing import temperature_mix
from data_ingest_spark.extensions.profile import ks_drift
from data_ingest_spark.extensions.similarity import (random_projection_fixed,
                                                     rp_sign)
from data_ingest_spark.extensions.text import canonical_url, doc_keywords


def test_rrf_fuse_ranks_and_scores(spark):
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], ["doc_id", "lex_score"])
    sem = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], ["doc_id", "sem_score"])
    out = {r["doc_id"]: r for r in rrf_fuse(lex, sem).collect()}
    assert out[1]["lex_rank"] == 1 and out[1]["sem_rank"] is None
    assert out[2]["lex_rank"] == 2 and out[2]["sem_rank"] == 1
    assert out[4]["lex_rank"] is None and out[4]["sem_rank"] == 2
    # doc 2 appears in both lists -> highest fused score
    assert out[2]["fused_rank"] == 1
    assert out[2]["rrf"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9)
    # singles score 1/61 (rank-1 lex) > 1/62 (rank-2 sem)
    assert out[1]["fused_rank"] == 2 and out[4]["fused_rank"] == 3


def test_rrf_fuse_candidate_cut(spark):
    lex = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], ["doc_id", "lex_score"])
    sem = spark.createDataFrame(
        [(99, 1.0)], ["doc_id", "sem_score"])
    out = rrf_fuse(lex, sem, n_candidates=3).collect()
    # only the lexical top-3 plus the semantic single survive
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 99]


def test_canonical_url_normalization(spark):
    cases = [
        # fragment dropped, scheme+host lowered, www stripped,
        # trailing slash stripped, utm params dropped, rest sorted
        ("HTTP://WWW.Ex.COM/A/b/?utm_x=1&b=2&a=1#frag",
         "http://ex.com/A/b?a=1&b=2"),
        ("https://ex.com/", "https://ex.com"),
        ("https://ex.com/p?utm_source=x", "https://ex.com/p"),
        ("ftp://Host.Net/Q//", "ftp://host.net/Q"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [want for _, want in cases]


def test_rp_sign_is_balanced_and_lcg_derived(spark):
    signs = [rp_sign(i) for i in range(512)]
    assert set(signs) == {-1, 1}
    # bit 16 of an LCG must not alternate like bit 0 does
    assert any(signs[i] == signs[i + 1] for i in range(511))


def test_random_projection_exact_sum(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5])], ["vec_id", "embedding"])
    rows = random_projection_fixed(
        emb, in_dim=3, out_dim=2).collect()
    q = [1000000, -2000000, 500000]
    for r in rows:
        want = sum(q[i] * rp_sign(i * 2 + r["dim"]) for i in range(3))
        assert r["component"] == want


def test_ks_drift_identical_distribution_is_zero(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r["source"]: r for r in ks_drift(df).collect()}
    assert out["a"]["ks_stat"] == 0.0 and out["b"]["ks_stat"] == 0.0
    assert out["a"]["n_docs"] == 3


def test_ks_drift_disjoint_supports(spark):
    # a = {1,2}, b = {3,4}: at v=2 CDF_a=1, CDF_global=0.5 -> D=0.5
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r["source"]: r["ks_stat"] for r in ks_drift(df).collect()}
    assert out["a"] == 0.5 and out["b"] == 0.5


def test_ks_drift_group_named_all_is_a_real_group(spark):
    """A source literally named '__all__' (or 'all') must be treated
    as an ordinary group, not merged into the global CDF (r4 ADVICE:
    sentinel collision). With groups {'__all__': {1,2}, 'all': {3,4}}
    both drift by 0.5 against the 4-doc global distribution."""
    rows = [("__all__", 1), ("__all__", 2), ("all", 3), ("all", 4)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r["source"]: r for r in ks_drift(df).collect()}
    assert set(out) == {"__all__", "all"}
    assert out["__all__"]["ks_stat"] == 0.5 and out["all"]["ks_stat"] == 0.5
    assert out["__all__"]["n_docs"] == 2 and out["all"]["n_docs"] == 2


def test_kcenter_greedy_empty_and_k_exceeds_n(spark):
    """r4 ADVICE edge cases: empty corpus -> empty result (no
    IndexError); k > #distinct points -> stop at coverage instead of
    re-emitting covered ids with radius2=0."""
    from data_ingest_spark.extensions.similarity import kcenter_greedy
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kcenter_greedy(empty, k=3).count() == 0
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"])
    out = sorted(kcenter_greedy(df, k=8).collect(),
                 key=lambda r: r["sel_order"])
    assert [r["vec_id"] for r in out] == [0, 1, 2]
    assert len({r["vec_id"] for r in out}) == 3


def test_doc_keywords_prefers_rare_tokens(spark):
    df = spark.createDataFrame(
        [(0, "common rare rare"), (1, "common other"),
         (2, "common common zed")], ["doc_id", "text"])
    out = [r for r in doc_keywords(df, top_k=1).collect()]
    by_doc = {r["doc_id"]: r for r in out}
    # 'common' has df=3 -> idf=0; each doc's keyword is its rare token
    assert by_doc[0]["token"] == "rare" and by_doc[0]["tf"] == 2
    assert by_doc[1]["token"] == "other"
    assert by_doc[2]["token"] == "zed"
    assert by_doc[0]["score"] == pytest.approx(
        round(2 * math.log(3.0 / 1.0), 6), abs=1e-9)


def test_temperature_mix_upweights_small_sources(spark):
    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {r["source"]: r for r in
           temperature_mix(df, alpha=0.3, budget=1000).collect()}
    w_big, w_small = 90 ** 0.3, 10 ** 0.3
    exp_big = w_big / (w_big + w_small)
    assert out["big"]["sample_rate"] == pytest.approx(exp_big, abs=1e-4)
    # alpha < 1 gives 'small' far more than its 10% population share
    assert out["small"]["sample_rate"] > 0.3
    assert out["big"]["quota"] + out["small"]["quota"] <= 1000
    assert out["big"]["n_docs"] == 90


def _pc1_mirror(mat, n_iters=3, q_scale=1000, c_shift=10**6, v_scale=1000):
    """Sequential integer mirror of power_iteration_pc1."""
    import math
    n, d = len(mat), len(mat[0])
    q = [[math.floor(x * q_scale + 0.5) for x in row] for row in mat]
    cs = [sum(q[r][i] for r in range(n)) for i in range(d)]
    c = [[q[r][i] * n - cs[i] for i in range(d)] for r in range(n)]
    cov = [[sum(c[r][j] * c[r][k] for r in range(n)) for k in range(d)]
           for j in range(d)]
    def tz(a, b):  # exact truncate-toward-zero division (b > 0)
        return -((-a) // b) if a < 0 else a // b
    cov = [[tz(cov[j][k], c_shift) for k in range(d)] for j in range(d)]
    v = [v_scale] * d
    for _ in range(n_iters):
        u = [sum(cov[j][k] * v[k] for k in range(d)) for j in range(d)]
        m = max(abs(x) for x in u)
        v = [tz(x * v_scale, m) for x in u]
    lead = next(x for x in v if x != 0)
    s = -1 if lead < 0 else 1
    return [s * x for x in v]


def test_power_pc1_matches_integer_mirror(spark):
    import numpy as np
    rng = np.random.default_rng(5)
    # planted dominant direction so power iteration is well-posed
    w = rng.normal(size=6)
    mat = (np.outer(rng.normal(size=40), w)
           + 0.1 * rng.normal(size=(40, 6)))
    mat = np.clip(mat / np.abs(mat).max() * 0.6, -0.6, 0.6)
    from data_ingest_spark.extensions.similarity import power_iteration_pc1
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"])
    got = {r["dim"]: r["component"]
           for r in power_iteration_pc1(emb, dim=6).collect()}
    want = _pc1_mirror(mat.tolist())
    assert [got[i] for i in range(6)] == want
    # and the fixed-point iterate is genuinely the top eigenvector
    cov = np.cov(mat.T)
    eigval, eigvec = np.linalg.eigh(cov)
    top = eigvec[:, -1]
    v = np.array([got[i] for i in range(6)], dtype=float)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99


def test_ivf_state_merge_equals_recompute(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(30, 4)) * 0.3
    from data_ingest_spark.extensions.similarity import (
        ivf_assign_state, ivf_seed_centroids, merge_ivf_state)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"])
    cents = ivf_seed_centroids(emb, k=3)
    full = {(r["cid"], r["dim"]): (r["n"], r["sum_q"])
            for r in ivf_assign_state(emb, cents).collect()}
    hist = ivf_assign_state(emb.filter("vec_id < 15"), cents)
    batch = ivf_assign_state(emb.filter("vec_id >= 15"), cents)
    merged = {(r["cid"], r["dim"]): (r["n"], r["sum_q"])
              for r in merge_ivf_state(hist, batch).collect()}
    assert merged == full


def test_skew_profile_flags_monster_key(spark):
    rows = [("hot", i) for i in range(90)] + [
        (f"k{i}", 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["key_col", "v"])
    from data_ingest_spark.functions.partitioning import skew_profile
    out = skew_profile(df, "key_col", top_k=2).collect()
    top = {r["key"]: r for r in out}
    assert list(top)[0] == "hot" and top["hot"]["cnt"] == 90
    assert top["hot"]["share"] == 0.9
    # 11 keys, mean ~9.09 -> skew factor 9.9, salt hint 9+1
    assert top["hot"]["skew_factor"] == pytest.approx(9.9, abs=1e-6)
    assert top["hot"]["salt_hint"] == 10
    assert all(r["cnt"] == 1 for k, r in top.items() if k != "hot")


def test_winsorize_stats_clips_both_tails(spark):
    rows = [("a", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, ["event_type", "value"])
    from data_ingest_spark.extensions.profile import winsorize_stats
    out = winsorize_stats(df).collect()[0]
    # percentile(0.05) over 1..100 interpolates to 5.95; p95 -> 95.05
    assert out["q_lo"] == pytest.approx(5.95, abs=1e-9)
    assert out["q_hi"] == pytest.approx(95.05, abs=1e-9)
    assert out["n_total"] == 100
    assert out["n_below"] == 5 and out["n_above"] == 5
    want = (5 * 5950000 + 5 * 95050000
            + sum(v * 1000000 for v in range(6, 96)))
    assert out["sum_clipped_fp"] == want


def test_pmi_prefers_exclusive_pairs(spark):
    docs = [(0, "alpha beta alpha beta alpha beta alpha beta alpha beta"),
            (1, "the x the y the z the w the v")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from data_ingest_spark.extensions.text import pmi_collocations
    out = {(r["w1"], r["w2"]): r
           for r in pmi_collocations(df, top_k=10, min_count=2).collect()}
    # 'alpha beta' always co-occur -> strongly positive PMI;
    # 'the *' pairs spread over many partners -> lower PMI
    ab = out[("alpha", "beta")]
    assert ab["pair_count"] == 5
    assert ab["pmi"] > 1.0
    the_pairs = [r for (w1, _), r in out.items() if w1 == "the"]
    assert all(ab["pmi"] > r["pmi"] for r in the_pairs)


def _canon_mirror(u):
    """Pure-Python mirror of tx.canonical_url's normalization spec."""
    import re
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    rest = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", u)
    host = re.sub(r"^www\.", "", re.match(r"^([^/?]*)", rest).group(1).lower())
    pathq = re.sub(r"^[^/?]*", "", rest, count=1)
    path = re.sub(r"/+$", "", re.match(r"^([^?]*)", pathq).group(1))
    qm = re.search(r"\?(.*)$", pathq)
    query = qm.group(1) if qm else ""
    params = sorted(p for p in query.split("&")
                    if p != "" and not p.startswith("utm_"))
    qs = "&".join(params)
    return scheme + "://" + host + path + (("?" + qs) if qs else "")


def test_canonical_url_matches_python_mirror_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    seg = st.text(alphabet="aBc09._-~", min_size=0, max_size=6)
    param = st.text(alphabet="aZ0=_%", min_size=0, max_size=8)
    url = st.builds(
        lambda sch, www, host, segs, ps, slash, frag:
            sch + "://" + www + host + "".join("/" + s for s in segs)
            + ("/" if slash else "")
            + (("?" + "&".join(ps)) if ps else "")
            + (("#" + frag) if frag else ""),
        st.sampled_from(["http", "HTTPS", "ftp", "s3"]),
        st.sampled_from(["", "www.", "WWW."]),
        st.text(alphabet="aBc09.-", min_size=1, max_size=10),
        st.lists(seg, max_size=3),
        st.lists(st.one_of(param, st.just("utm_x=1")), max_size=4),
        st.booleans(),
        st.text(alphabet="aB1/?&", min_size=0, max_size=5))

    @given(st.lists(url, min_size=1, max_size=40))
    @settings(max_examples=6, deadline=None)
    def check(urls):
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        got = [r[0] for r in df.select(canonical_url("url")).collect()]
        assert got == [_canon_mirror(u) for u in urls]

    check()


def test_temporal_split_embargo_semantics(spark):
    from data_ingest_spark.extensions.sampling import temporal_split
    rows = [(1, "2024-01-20 00:00:00"), (2, "2024-01-23 12:00:00"),
            (3, "2024-01-24 00:00:00"), (4, "2024-01-25 00:00:00")]
    df = spark.createDataFrame(rows, ["id", "ts_s"]).select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {r["id"]: r["split"]
           for r in temporal_split(df, "2024-01-24 00:00:00",
                                   embargo_s=86400).collect()}
    assert out == {1: "train", 2: "embargo", 3: "test", 4: "test"}


def test_profile_drift_flags_changes(spark):
    from data_ingest_spark.extensions.profile import profile_drift
    a = spark.createDataFrame(
        [(i, f"u{i}", i * 10) for i in range(10)], ["id", "u", "v"])
    b = spark.createDataFrame(
        [(i, f"u{i}" if i % 3 else None, i * 10) for i in range(8)],
        ["id", "u", "v"])
    out = {r["column"]: r for r in profile_drift(a, b).collect()}
    assert out["id"]["n_rows_delta"] == -2
    assert out["u"]["n_nulls_delta"] == 3      # u0, u3, u6 nulled
    assert out["u"]["n_distinct_delta"] == -5  # 10 -> 5 non-null distinct
    assert out["id"]["max_changed"] is True    # 9 -> 7
    assert out["id"]["min_changed"] is False
    assert out["v"]["n_nulls_delta"] == 0


def test_weighted_sample_favors_heavy_rows(spark):
    from data_ingest_spark.extensions.sampling import weighted_sample
    # weights 10000:1 — the heavy half should dominate a k=20 sample
    rows = [(i, "s", 10000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    out = weighted_sample(df, "w", 20, id_col="doc_id", by="source",
                          seed=29).collect()
    assert len(out) == 20
    assert all(1 <= r["rank"] <= 20 for r in out)
    heavy = sum(1 for r in out if r["w"] == 10000)
    assert heavy >= 18  # priority u/w: heavy rows ~10000x likelier
    # without replacement: ids unique
    assert len({r["doc_id"] for r in out}) == 20


def test_weighted_sample_is_partition_stable(spark):
    from data_ingest_spark.extensions.sampling import weighted_sample
    rows = [(i, "a" if i % 2 else "b", i + 1) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "w"])
    one = {(r["source"], r["doc_id"])
           for r in weighted_sample(df, "w", 5).collect()}
    other = {(r["source"], r["doc_id"])
             for r in weighted_sample(df.repartition(7), "w", 5).collect()}
    assert one == other and len(one) == 10


def test_wilson_lcb_guards_small_samples(spark):
    from data_ingest_spark.extensions.evaluation import wilson_winrate
    # item 1: 2/2 wins; item 2: 90/100 — raw rate ranks 1 first,
    # the Wilson LCB must rank 2 first
    rows = ([(1, "purchase")] * 2
            + [(2, "purchase")] * 90 + [(2, "click")] * 10
            + [(3, "view")])
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {r["user_id"]: r for r in wilson_winrate(df).collect()}
    assert 3 not in out  # no win/loss outcomes -> excluded
    assert out[1]["win_rate"] == 1.0 and out[2]["win_rate"] == 0.9
    assert out[2]["wilson_lcb"] > out[1]["wilson_lcb"]
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2
    # LCB is a lower bound and lies in [0, 1)
    for r in out.values():
        assert 0.0 <= r["wilson_lcb"] < r["win_rate"] <= 1.0


def test_hist_merge_equals_recompute_and_clamps(spark):
    from data_ingest_spark.extensions.sketches import (equi_width_hist,
                                                       merge_hists)
    # values -5 and 105 must clamp into the edge bins, not vanish
    vals = [(-5.0,), (0.5,), (3.0,), (55.0,), (105.0,), (None,)]
    df = spark.createDataFrame(vals, ["v"])
    direct = {r["bin"]: r["n"]
              for r in equi_width_hist(df, "v", 0.0, 100.0, 10).collect()}
    assert direct == {0: 3, 5: 1, 9: 1}  # -5 -> bin 0, 105 -> bin 9
    a = equi_width_hist(df.limit(3), "v", 0.0, 100.0, 10)
    b = equi_width_hist(df.subtract(df.limit(3)), "v", 0.0, 100.0, 10)
    merged = {r["bin"]: r["n"] for r in merge_hists(a, b).collect()}
    assert merged == direct


def test_kcenter_greedy_covers_clusters(spark):
    from data_ingest_spark.extensions.similarity import kcenter_greedy
    # two tight clusters far apart in 64-d: the 2nd pick must come
    # from the opposite cluster, and radii never increase
    def vec(base, eps):
        return [base + eps] + [0.0] * 63
    rows = ([(i, vec(0.0, i * 1e-4)) for i in range(5)]
            + [(10 + i, vec(0.5, i * 1e-4)) for i in range(5)])
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sorted(kcenter_greedy(df, k=4).collect(),
                 key=lambda r: r["sel_order"])
    assert out[0]["vec_id"] == 0 and out[0]["radius2"] == 0
    assert out[1]["vec_id"] >= 10          # farthest = other cluster
    radii = [r["radius2"] for r in out[1:]]
    assert radii == sorted(radii, reverse=True)  # non-increasing
    # after both clusters are covered, radius drops to intra-cluster
    assert out[2]["radius2"] < out[1]["radius2"] / 100


def test_quantile_normalize_aligns_distributions(spark):
    from data_ingest_spark.extensions.profile import quantile_normalize
    # source a: values 1..4; source b: 101..104 — after normalization
    # both must map onto the SAME global quantile values, making the
    # two sources' normalized distributions identical
    rows = ([(i, "a", i) for i in range(1, 5)]
            + [(10 + i, "b", 100 + i) for i in range(1, 5)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = quantile_normalize(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(
            (r["src_rank"], r["norm_value"]))
    assert sorted(by_src["a"]) == sorted(by_src["b"])
    # rank order preserved within each source
    a = sorted(by_src["a"])
    assert [v for _, v in a] == sorted(v for _, v in a)
    # normalized values come from the global value set
    vals = {r["norm_value"] for r in out}
    assert vals <= {1, 2, 3, 4, 101, 102, 103, 104}
