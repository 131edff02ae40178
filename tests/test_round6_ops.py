"""Round-6 operator additions: record linkage (blocked pairs,
Fellegi–Sunter, sorted neighborhood), winnowing fingerprints +
df-capped fingerprint pairs, LSH candidate extraction, timing
regularity, per-group Gini, JS divergence, token fertility."""

import hashlib
import math

from pyspark.sql import functions as F

from data_ingest_spark.extensions.dedup import (blocked_pairs,
                                                fellegi_sunter_score,
                                                fingerprint_pairs,
                                                lsh_candidate_pairs,
                                                near_dup_pairs,
                                                sorted_neighborhood_pairs)
from data_ingest_spark.extensions.profile import (gap_regularity,
                                                  gini_by_group,
                                                  js_divergence)
from data_ingest_spark.extensions.text import (token_fertility,
                                               winnowing_fingerprints)


# ------------------------------------------------------- record linkage

def test_blocked_pairs_within_block_only(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 40)],
        ["doc_id", "blk", "v"])
    rows = blocked_pairs(df, ["blk"]).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in rows}
    # C(3,2) within block a, none across blocks, ids ordered
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    assert all(r["v_a"] == r["doc_id_a"] * 10 for r in rows)


def test_fellegi_sunter_weights_and_decisions(spark):
    m, u = [0.9, 0.8], [0.1, 0.2]
    wa = [round(math.log(mi / ui), 9) for mi, ui in zip(m, u)]
    wd = [round(math.log((1 - mi) / (1 - ui)), 9) for mi, ui in zip(m, u)]
    df = spark.createDataFrame(
        [(True, True), (True, False), (False, False)], ["f1", "f2"])
    out = {(r["f1"], r["f2"]): (r["weight"], r["decision"])
           for r in fellegi_sunter_score(df, ["f1", "f2"], m, u).collect()}
    assert out[(True, True)] == (round(wa[0] + wa[1], 6), "match")
    # ln(9)+ln((0.2)/(0.8)) = 2.197−1.386 ≈ 0.81 → possible
    assert out[(True, False)] == (round(wa[0] + wd[1], 6), "possible")
    assert out[(False, False)][1] == "nonmatch"


def test_sorted_neighborhood_window_pairs(spark):
    # sort key = text itself; order: a1(1) a2(3) b(2) c(4) z(5)
    df = spark.createDataFrame(
        [(1, "aa"), (3, "aa"), (2, "bb"), (4, "cc"), (5, "zz")],
        ["doc_id", "text"])
    rows = sorted_neighborhood_pairs(df, F.col("text"), window=2).collect()
    pairs = {(r["doc_id_a"], r["doc_id_b"]) for r in rows}
    # rank order by (text, id): 1,3,2,4,5 → window-2 adjacencies
    assert pairs == {(1, 3), (1, 2), (2, 3), (2, 4), (3, 4), (2, 5),
                     (4, 5)}
    # normalization: id_a < id_b even where rank order says otherwise
    assert all(r["doc_id_a"] < r["doc_id_b"] for r in rows)


# ------------------------------------------ winnowing / fingerprint pairs

def _winnow_py(text: str, k: int = 8, window: int = 4) -> set:
    """Literal mirror of text.winnowing_fingerprints."""
    if len(text) < k + window - 1:
        return set()
    hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:12], 16)
          for i in range(len(text) - k + 1)]
    return {min(hs[i - window + 1:i + 1])
            for i in range(window - 1, len(hs))}


def test_winnowing_matches_python_mirror(spark):
    import random
    rng = random.Random(7)
    docs = [(i, "".join(rng.choice("abcdef gh") for _ in range(
        rng.randint(5, 60)))) for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in winnowing_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in docs:
        assert got.get(i, set()) == _winnow_py(t), f"doc {i}"


def test_winnowing_shared_substring_guarantee():
    # SIGMOD'03 guarantee on the mirror: any common substring of
    # length ≥ k + window − 1 yields a shared fingerprint — here the
    # whole of t inside a shifted copy.
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet="abcxy ", min_size=11, max_size=50),
           st.text(alphabet="qz", min_size=1, max_size=5))
    def prop(t, prefix):
        assert _winnow_py(t) & _winnow_py(prefix + t)
    prop()


def test_fingerprint_pairs_min_shared_and_df_cap(spark):
    rows = [(1, f) for f in range(12)] + [(2, f) for f in range(12)]
    rows += [(3, 100), (4, 100)]          # only 1 shared
    rows += [(i, 999) for i in range(40)]  # hot fp below df cap of 3
    df = spark.createDataFrame(rows, ["doc_id", "fp"])
    out = fingerprint_pairs(df, min_shared=10, max_df=3).collect()
    assert [(r["id_a"], r["id_b"], r["n_shared"]) for r in out] == [(1, 2, 12)]


def test_lsh_candidates_superset_of_verified_pairs(spark):
    docs = [(i, f"w{i} common text body shared tokens here {i}")
            for i in range(8)]
    docs += [(100 + i, docs[i][1]) for i in range(4)]  # exact copies
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from data_ingest_spark.extensions.dedup import minhash_bands
    cand = {(r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(minhash_bands(df)).collect()}
    verified = {(r["id_a"], r["id_b"])
                for r in near_dup_pairs(df, threshold=0.9).collect()}
    assert verified and verified <= cand
    assert all(a < b for a, b in cand)


# ----------------------------------------------------- profiling kernels

def test_gap_regularity_metronome_vs_bursty(spark):
    base = 1_700_000_000_000_000  # µs epoch
    rows = [(i, base + i * 1_000_000, 1) for i in range(10)]       # 1s grid
    rows += [(100 + i, base + [0, 1, 10, 11, 100, 101, 500, 501,
                               900, 1000][i] * 1_000_000, 2)
             for i in range(10)]
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    out = {r["user_id"]: r for r in gap_regularity(
        df, min_gaps=5).collect()}
    assert out[1]["cv_gap"] == 0.0 and out[1]["is_regular"]
    assert out[1]["mean_gap_s"] == 1.0
    assert out[2]["cv_gap"] > 0.5 and not out[2]["is_regular"]


def test_gap_regularity_half_microsecond_mean_rounds_up(spark):
    # gaps 1µs and 2µs: mean 1.5µs → half-up integer µs = 2
    base = 1_700_000_000_000_000
    rows = [(0, base, 1), (1, base + 1, 1), (2, base + 3, 1)]
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    r = gap_regularity(df, min_gaps=2).collect()[0]
    assert r["mean_gap_s"] == 2e-06


def test_gini_uniform_zero_and_concentrated(spark):
    rows = [(i, "u", 5) for i in range(4)]
    rows += [(i, "c", 0) for i in range(4)] + [(99, "c", 100)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = {r["source"]: r for r in gini_by_group(df).collect()}
    assert out["u"]["gini"] == 0.0
    # all mass on the last of 5 docs: G = (n−1)/n = 0.8
    assert out["c"]["gini"] == 0.8


def test_js_divergence_identical_zero_disjoint_ln2(spark):
    a = spark.createDataFrame([(1, "alpha beta gamma")], ["doc_id", "text"])
    same = js_divergence(a, a).collect()[0]
    assert same["jsd"] == 0.0
    # buckets: alpha 58, beta 43, gamma 13 vs delta 63, eta 29,
    # theta 62 — fully disjoint, so JSD is exactly ln 2
    b = spark.createDataFrame([(2, "delta eta theta")],
                              ["doc_id", "text"])
    dis = js_divergence(a, b).collect()[0]
    assert dis["jsd"] == round(math.log(2), 6)


def test_token_fertility_simple(spark):
    df = spark.createDataFrame([(1, "ab cd", "en", 5)],
                               ["doc_id", "text", "lang", "n_chars"])
    r = token_fertility(df).collect()[0]
    assert (r["n_tokens"], r["chars_per_token"]) == (2, 2.5)


def test_ppjoin_differential_vs_brute_force(spark):
    """PPJoin's prefix filter claims PERFECT recall (pigeonhole on the
    shared global order). Differential-test it: on a small random
    corpus with a tiny vocabulary (to force overlaps), the output must
    EQUAL the brute-force all-pairs exact Jaccard at the threshold —
    no pair lost to the prefix index, none invented."""
    import itertools
    import random

    from data_ingest_spark.extensions.dedup import ppjoin

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(3, 10))))
            for i in range(24)]
    sets = {i: set(t.lower().split()) for i, t in docs}
    brute = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= 0.6:
            brute[(a, b)] = round(j, 6)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ppjoin(df, k=1).collect()}
    assert got == brute


def test_winnowing_pairs_differential_vs_brute_force(spark):
    """End-to-end x148 shape: winnowing fingerprints + df-capped
    posting lists must equal the brute-force mirror (shared-count of
    the python fingerprint sets, same df cap) on a random corpus with
    planted near-copies."""
    import itertools
    import random

    rng = random.Random(21)
    docs = [(i, "".join(rng.choice("abcd ef") for _ in range(
        rng.randint(12, 80)))) for i in range(20)]
    docs += [(100 + i, "zz" + docs[i][1]) for i in range(6)]  # copies
    fsets = {i: _winnow_py(t) for i, t in docs}
    df_count = {}
    for s in fsets.values():
        for fp in s:
            df_count[fp] = df_count.get(fp, 0) + 1
    kept = {fp for fp, c in df_count.items() if 2 <= c <= 5}
    brute = {}
    for a, b in itertools.combinations(sorted(fsets), 2):
        shared = len(fsets[a] & fsets[b] & kept)
        if shared >= 3:
            brute[(a, b)] = shared
    from data_ingest_spark.extensions.dedup import fingerprint_pairs
    from data_ingest_spark.extensions.text import winnowing_fingerprints
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in fingerprint_pairs(winnowing_fingerprints(sdf),
                                      min_shared=3, max_df=5).collect()}
    assert got == brute and brute  # non-vacuous: copies must pair


def test_gini_mirror_hypothesis():
    """Rank-formula Gini on the python mirror: scale invariance
    (G(cx) = G(x)) and the exact uniform/concentrated endpoints."""
    from hypothesis import given, settings, strategies as st

    def gini_py(xs):
        xs = sorted(xs)
        n, sx = len(xs), sum(xs)
        if sx == 0:
            return None
        sxr = sum((i + 1) * x for i, x in enumerate(xs))
        return (2 * sxr - (n + 1) * sx) / (n * sx)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=10**6),
                    min_size=2, max_size=40).filter(lambda xs: sum(xs) > 0),
           st.integers(min_value=1, max_value=1000))
    def prop(xs, c):
        g = gini_py(xs)
        assert 0.0 <= g <= 1.0 - 1.0 / len(xs) + 1e-12
        assert abs(gini_py([c * x for x in xs]) - g) < 1e-9
    prop()


# --------------------------------------------------- batch-2 kernels

def test_rbo_identical_and_disjoint(spark):
    from data_ingest_spark.extensions.evaluation import (rbo_overlap,
                                                         rbo_suffix_weights)
    w = rbo_suffix_weights(10, 0.9)
    # user 1: value order == recency order (both descending with i) —
    # identical top-10 → rbo = Σ_d W[d]; user 2: value order exactly
    # reverses recency order over 20 items → top-10s are disjoint →
    # no common row at all
    rows = [(i, float(100 - i), 1000 - i, 1) for i in range(12)]
    rows += [(100 + i, float(i), 2000 - i, 2) for i in range(20)]
    df = spark.createDataFrame(rows, ["event_id", "value", "us", "user_id"]) \
        .select("event_id", "value", "user_id",
                F.timestamp_micros(F.col("us") * 1000000).alias("ts"))
    out = {r["user_id"]: r for r in rbo_overlap(df).collect()}
    assert out[1]["n_common"] == 10
    assert out[1]["rbo"] == round(sum(w), 6)
    assert 2 not in out


def test_kendall_tau_perfect_and_reversed(spark):
    from data_ingest_spark.extensions.evaluation import kendall_tau_b
    rows = [(i, float(i), float(i), 1) for i in range(6)]        # agree
    rows += [(10 + i, float(i), float(-i), 2) for i in range(6)]  # reverse
    rows += [(20 + i, float(i // 2), float(i), 3) for i in range(6)]  # x ties
    df = spark.createDataFrame(rows, ["event_id", "value", "_y", "user_id"])
    out = {r["user_id"]: r for r in kendall_tau_b(df).collect()}
    assert out[1]["tau_b"] == 1.0 and out[1]["discordant"] == 0
    assert out[2]["tau_b"] == -1.0 and out[2]["concordant"] == 0
    # x = [0,0,1,1,2,2], y = 0..5: C = 12, D = 0, n1 = 3, n0 = 15
    import math
    exp = round(12 / math.sqrt((15 - 3) * 15), 6)
    assert out[3]["tau_b"] == exp


def test_peak_concurrency_overlap_and_touching(spark):
    from data_ingest_spark.extensions.evaluation import peak_concurrency
    base = 1_700_000_000_000_000
    rows = [(1, base, 10.0, "a"), (2, base + 5_000_000, 10.0, "a"),
            (3, base + 20_000_000, 10.0, "a"),
            # type b: touching intervals [0,10],[10,20] never overlap
            (4, base, 10.0, "b"), (5, base + 10_000_000, 10.0, "b")]
    df = spark.createDataFrame(
        rows, ["event_id", "us", "value", "event_type"]).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "value", "event_type")
    out = {r["event_type"]: r for r in peak_concurrency(df).collect()}
    assert out["a"]["peak"] == 2
    assert out["a"]["first_peak_t"] == base + 5_000_000
    assert out["b"]["peak"] == 1
    assert out["b"]["first_peak_t"] == base


def test_term_dispersion_even_vs_confined(spark):
    from data_ingest_spark.extensions.text import term_dispersion
    # parts A and B, 8 tokens each: "even" appears 2+2, "burst" 4+0
    docs = [(1, "A", "even even burst burst burst burst pad1 pad2"),
            (2, "B", "even even pad3 pad4 pad5 pad6 pad7 pad8")]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    out = {r["term"]: r["dp"] for r in
           term_dispersion(df, top_k=50, min_count=2).collect()}
    assert out["even"] == 0.0          # v = (.5,.5) = s
    assert out["burst"] == 0.5         # v = (1,0), s = (.5,.5)


def test_gopher_gate_rules(spark):
    from data_ingest_spark.extensions.curate import gopher_gate
    good = "the cat sat on the mat and went to sleep in the warm sun " * 2
    sym = "@@@ ### $$$ %%% ^^^ &&& *** !!! ((( ))) " * 3
    rep = "spam " * 40
    zh = "中文" * 60
    docs = [(1, good, "en"), (2, sym, "en"), (3, rep, "en"), (4, zh, "zh")]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"]) \
        .withColumn("n_chars", F.length("text"))
    out = {r["doc_id"]: r for r in gopher_gate(df).collect()}
    assert out[1]["pass"]
    assert not out[2]["r_symbol"] and not out[2]["pass"]
    assert not out[3]["r_distinct"] and not out[3]["pass"]
    # zh: symbol/stop rules auto-pass; distinct ratio of "中文中文…"
    # (one token) is 1.0
    assert out[4]["r_symbol"] and out[4]["r_stop"]


def test_gopher_gate_null_rows_fail_closed(spark):
    """Round-6 ADVICE (low): NULL lang / NULL text rows must produce
    FALSE rules and a FALSE (never NULL) `pass`, so per-rule failure
    reporting and pass-rate aggregates see the row instead of silently
    skipping it."""
    from pyspark.sql import types as T
    from data_ingest_spark.extensions.curate import gopher_gate
    good = "the cat sat on the mat and went to sleep in the warm sun " * 2
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.IntegerType())])
    docs = [(1, good, "en", len(good)),
            (2, good, None, len(good)),   # NULL lang
            (3, None, "en", None)]        # NULL text
    df = spark.createDataFrame(docs, schema)
    out = {r["doc_id"]: r for r in gopher_gate(df).collect()}
    assert out[1]["pass"] is True
    # NULL lang: EN-only rules treat it as non-EN (auto-pass), other
    # rules evaluate on the real text — pass must be a real boolean
    assert out[2]["pass"] is True
    assert out[2]["r_symbol"] is True and out[2]["r_stop"] is True
    # NULL text fails closed on every rule, never NULL
    for rule in ("r_len", "r_wordlen", "r_symbol", "r_stop",
                 "r_distinct", "pass"):
        assert out[3][rule] is False, rule


def test_k_anonymity_flags_small_classes_only(spark):
    from data_ingest_spark.extensions.profile import k_anonymity
    rows = [(i, "a", "x") for i in range(10)]      # class of 10: safe
    rows += [(100, "b", "x"), (101, "b", "x")]      # class of 2: at risk
    rows += [(200, "c", "y")]                       # class of 1: at risk
    df = spark.createDataFrame(rows, ["id", "q1", "q2"])
    out = {(r["q1"], r["q2"]): r["class_size"]
           for r in k_anonymity(df, ["q1", "q2"], k=5).collect()}
    assert out == {("b", "x"): 2, ("c", "y"): 1}


def test_auc_rank_skips_null_scores(spark):
    """Regression (round-5 ADVICE): a NULL score used to become a NULL
    coarse-bucket map key and fail at runtime — now null-scored rows
    are excluded before the census, so the AUC equals the non-null
    subset's."""
    from data_ingest_spark.extensions.evaluation import auc_rank
    rows = [(1, 0.9), (1, 0.8), (0, 0.4), (0, 0.1),
            (1, None), (0, None)]
    df = spark.createDataFrame(rows, "label int, score double")
    r = auc_rank(df).collect()[0]
    clean = auc_rank(df.filter(F.col("score").isNotNull())).collect()[0]
    assert r["auc"] == clean["auc"] == 1.0


def test_banded_hamming_differential_vs_brute_force(spark):
    """The banded-Hamming join claims EXACT recall (pigeonhole:
    distance ≤ d pairs agree on one of d+1 bands). Differential-test
    against brute force on random 16-bit hashes with planted
    near-pairs — output must match all-pairs Hamming exactly, both
    directions (none lost, none invented)."""
    import itertools
    import random

    from data_ingest_spark.extensions.multimodal import phash_neardup_pairs

    rng = random.Random(31)
    hashes = {i: rng.randrange(1 << 16) for i in range(60)}
    nid = 100
    for i in range(0, 20, 2):         # plant exact + 1-bit + 2-bit
        hashes[nid] = hashes[i]
        hashes[nid + 1] = hashes[i] ^ (1 << rng.randrange(16))
        hashes[nid + 2] = (hashes[i] ^ (1 << rng.randrange(16))
                           ^ (1 << rng.randrange(16)))
        nid += 3
    brute = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[a] ^ hashes[b]).count("1")
        if d <= 2:
            brute[(a, b)] = d
    df = spark.createDataFrame(list(hashes.items()), ["doc_id", "phash"])
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_neardup_pairs(df).collect()}
    assert got == brute and brute


def test_containment_differential_vs_brute_force(spark):
    """containment_pairs with the df-cap above the corpus size must
    EQUAL brute-force all-pairs shingle containment — excerpts found
    with the exact scores, nothing invented."""
    import itertools
    import random
    import re

    from data_ingest_spark.extensions.dedup import containment_pairs

    def sh(text):
        toks = re.split(r"\s+", text.lower())
        if len(toks) >= 3:
            return {" ".join(toks[i:i + 3])
                    for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(
        rng.randint(6, 40)))) for i in range(15)]
    # plant excerpts: doc 100+i = a 10-token slice of doc i
    for i in range(5):
        toks = docs[i][1].split()
        if len(toks) >= 12:
            docs.append((100 + i, " ".join(toks[1:11])))
    sets = {i: sh(t) for i, t in docs}
    brute = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        c = len(sets[a] & sets[b]) / len(sets[a])
        if c >= 0.8:
            brute[(a, b)] = round(c, 6)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["contained_id"], r["container_id"]): r["containment"]
           for r in containment_pairs(df, max_df=10**6).collect()}
    assert got == brute and brute


def test_dup_clusters_differential_vs_union_find(spark):
    """Min-label CC vs a python union-find on a random sparse graph
    (long chains included — the worst case for round-bounded
    propagation): every node must land in the component labeled by
    its true minimum member."""
    import random

    from data_ingest_spark.extensions.dedup import dup_clusters

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(0, 12)]          # 13-node chain
    edges += [(rng.randrange(20, 60), rng.randrange(20, 60))
              for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        parent[find(x)] = find(y)

    for a, b in edges:
        union(a, b)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    truth = {n: min(members) for members in comp.values()
             for n in members}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["doc_id"]: r["cluster"]
           for r in dup_clusters(df).collect()}
    assert got == truth


def test_peak_concurrency_differential_vs_sweep(spark):
    """Boundary-sweep kernel vs a python mirror on random intervals
    (including exact-touch and duplicate boundaries — the tie cases
    the (t, delta, id) ordering must settle deterministically)."""
    import random

    from data_ingest_spark.extensions.evaluation import peak_concurrency

    rng = random.Random(17)
    base = 1_700_000_000_000_000
    rows = []
    for eid in range(60):
        start = base + rng.randrange(0, 50) * 500_000     # 0.5 s grid
        dur = rng.randrange(1, 8) * 0.5                    # exact .5 s
        rows.append((eid, start, dur, ["a", "b"][eid % 2]))
    # python mirror: ends sort before starts at the same instant
    truth = {}
    for key in ("a", "b"):
        bounds = []
        for eid, s, d, k in rows:
            if k != key:
                continue
            e = s + round(d * 1_000_000)
            bounds += [(s, 1, eid), (e, -1, eid)]
        bounds.sort()
        cur = peak = 0
        first_t = None
        for t, delta, _ in bounds:
            cur += delta
            if cur > peak:
                peak, first_t = cur, t
        truth[key] = (peak, first_t)
    df = spark.createDataFrame(
        rows, ["event_id", "us", "value", "event_type"]).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "value", "event_type")
    got = {r["event_type"]: (r["peak"], r["first_peak_t"])
           for r in peak_concurrency(df).collect()}
    assert got == truth


def test_kendall_tau_differential_vs_quadratic(spark):
    """τ-b vs the direct O(n²) definition on random data with ties in
    both variables."""
    import math
    import random

    from data_ingest_spark.extensions.evaluation import kendall_tau_b

    rng = random.Random(23)
    rows = [(i, float(rng.randrange(6)), float(rng.randrange(6)), u)
            for u in (1, 2, 3) for i in range(u * 100, u * 100 + 25)]
    truth = {}
    for u in (1, 2, 3):
        pts = [(x, y) for (_, x, y, uu) in rows if uu == u]
        c = d = n1 = n2 = 0
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                sx = (pts[i][0] > pts[j][0]) - (pts[i][0] < pts[j][0])
                sy = (pts[i][1] > pts[j][1]) - (pts[i][1] < pts[j][1])
                if sx == 0:
                    n1 += 1
                if sy == 0:
                    n2 += 1
                if sx * sy > 0:
                    c += 1
                elif sx * sy < 0:
                    d += 1
        n0 = len(pts) * (len(pts) - 1) // 2
        truth[u] = round((c - d) / math.sqrt((n0 - n1) * (n0 - n2)), 6)
    df = spark.createDataFrame(rows, ["event_id", "value", "_y", "user_id"])
    got = {r["user_id"]: r["tau_b"] for r in kendall_tau_b(df).collect()}
    assert got == truth


def test_rbo_differential_vs_direct_definition(spark):
    """Suffix-weight RBO vs the direct truncated definition
    Σ_d w_d·|A_d ∩ B_d| on random rankings."""
    import random

    from data_ingest_spark.extensions.evaluation import (rbo_overlap,
                                                         rbo_suffix_weights)

    k, p = 10, 0.9
    w = [round((1 - p) * p ** (d - 1) / d, 9) for d in range(1, k + 1)]
    rng = random.Random(29)
    rows = []
    for u in (1, 2):
        vals = rng.sample(range(100), 30)
        ts = rng.sample(range(100), 30)
        rows += [(u * 1000 + i, float(vals[i]), 10**15 + ts[i] * 10**6, u)
                 for i in range(30)]
    truth = {}
    for u in (1, 2):
        items = [(eid, v, t) for (eid, v, t, uu) in rows if uu == u]
        ra = [e for e, _, _ in sorted(items, key=lambda x: (-x[1], x[0]))]
        rb = [e for e, _, _ in sorted(items, key=lambda x: (-x[2], x[0]))]
        s = sum(wd * len(set(ra[:d]) & set(rb[:d]))
                for d, wd in zip(range(1, k + 1), w))
        truth[u] = round(s, 6)
    df = spark.createDataFrame(
        rows, ["event_id", "value", "us", "user_id"]).select(
        "event_id", "value", "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"))
    got = {r["user_id"]: r["rbo"] for r in rbo_overlap(df).collect()}
    assert got == truth


def test_gap_regularity_differential_vs_numpy(spark):
    """cv/mean vs the literal decimal-moment mirror on random event
    times with duplicate timestamps (the id tie-break case)."""
    import math
    import random

    rng = random.Random(37)
    base = 1_700_000_000_000_000
    rows = []
    for u in (1, 2):
        times = sorted(rng.randrange(0, 10**9) for _ in range(30))
        times[5] = times[4]                      # duplicate instant
        rows += [(u * 1000 + i, base + t, u)
                 for i, t in enumerate(times)]
    truth = {}
    for u in (1, 2):
        evs = sorted((t, eid) for (eid, t, uu) in rows if uu == u)
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        n, s = len(gaps), sum(gaps)
        ss = sum(g * g for g in gaps)
        cv = math.sqrt(float(n * ss - s * s) / (n * (n - 1))) / (s / n)
        truth[u] = (n, float((2 * s + n) // (2 * n)) / 1e6,
                    round(cv, 6))
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    got = {r["user_id"]: (r["n_gaps"], r["mean_gap_s"], r["cv_gap"])
           for r in gap_regularity(df, min_gaps=5).collect()}
    assert got == truth


def test_term_dispersion_differential_vs_mirror(spark):
    """Gries DP vs the direct Σ_parts |v−s| definition (including
    zero-occurrence parts, which the kernel folds in closed form)."""
    import random
    import re

    from data_ingest_spark.extensions.text import term_dispersion

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, f"src{i % 4}", " ".join(rng.choice(vocab)
                                        for _ in range(20)))
            for i in range(16)]
    parts = {}
    for _, p, t in docs:
        for tok in re.split(r"\s+", t.lower()):
            parts.setdefault(p, []).append(tok)
    psz = {p: len(toks) for p, toks in parts.items()}
    tot = sum(psz.values())
    cnt = {}
    for p, toks in parts.items():
        for tok in toks:
            cnt[(p, tok)] = cnt.get((p, tok), 0) + 1
    ct = {}
    for (p, tok), c in cnt.items():
        ct[tok] = ct.get(tok, 0) + c
    truth = {}
    for tok, c_t in ct.items():
        if c_t < 20:
            continue
        dp = 0.5 * sum(abs(cnt.get((p, tok), 0) / c_t - psz[p] / tot)
                       for p in psz)
        truth[tok] = (c_t, round(dp, 6))
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    got = {r["term"]: (r["n_occurrences"], r["dp"]) for r in
           term_dispersion(df, top_k=1000, min_count=20).collect()}
    assert got == truth and truth


def test_js_divergence_differential_vs_mirror(spark):
    """Bucketed JSD vs the direct two-distribution definition on
    random corpora (partial bucket overlap)."""
    import hashlib
    import math
    import random
    import re

    rng = random.Random(43)
    vocab = [f"w{i}" for i in range(40)]
    mk = lambda n: [(i, " ".join(rng.choice(vocab) for _ in range(15)))
                    for i in range(n)]
    da, db = mk(12), mk(12)

    def counts(docs):
        c = {}
        for _, t in docs:
            for tok in re.split(r"\s+", t.lower()):
                b = int(hashlib.md5(tok.encode()).hexdigest()[:7],
                        16) % 64
                c[b] = c.get(b, 0) + 1
        return c
    ca, cb = counts(da), counts(db)
    ta, tb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for b in set(ca) | set(cb):
        pv, qv = ca.get(b, 0) / ta, cb.get(b, 0) / tb
        m = (pv + qv) / 2.0
        if pv > 0:
            jsd += 0.5 * pv * math.log(pv / m)
        if qv > 0:
            jsd += 0.5 * qv * math.log(qv / m)
    a = spark.createDataFrame(da, ["doc_id", "text"])
    b = spark.createDataFrame(db, ["doc_id", "text"])
    r = js_divergence(a, b).collect()[0]
    assert (r["n_buckets_a"], r["n_buckets_b"]) == (len(ca), len(cb))
    assert r["jsd"] == round(jsd, 6)


def test_pattern_negation_semantics(spark):
    from data_ingest_spark.extensions.evaluation import pattern_negation
    base = 1_700_000_000_000_000
    S = 1_000_000
    rows = [
        # user 1: signup -> purchase, no click between: clean
        (1, base, "signup", 1), (2, base + 10 * S, "purchase", 1),
        # user 2: signup -> click -> purchase: converts, not clean
        (3, base, "signup", 2), (4, base + 5 * S, "click", 2),
        (5, base + 10 * S, "purchase", 2),
        # user 3: signup, purchase too late (outside window)
        (6, base, "signup", 3), (7, base + 10**9 * S, "purchase", 3),
        # user 4: click BEFORE signup then purchase: clean (strictly
        # between only)
        (8, base - 5 * S, "click", 4), (9, base, "signup", 4),
        (10, base + 10 * S, "purchase", 4),
    ]
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type",
                                      "user_id"]).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "user_id")
    out = {r["user_id"]: (r["n_starts"], r["n_conversions"], r["n_clean"])
           for r in pattern_negation(df).collect()}
    assert out == {1: (1, 1, 1), 2: (1, 1, 0), 3: (1, 0, 0),
                   4: (1, 1, 1)}


def test_decay_attribution_normalizes_and_decays(spark):
    from data_ingest_spark.extensions.evaluation import decay_attribution
    base = 1_700_000_000_000_000
    H = 3600 * 1_000_000
    rows = [
        # one conversion with one click exactly one half-life before
        # and one view exactly two half-lives before: weights
        # 500000 : 250000 → credits 2/3 and 1/3
        (1, base - H, "click", 1), (2, base - 2 * H, "view", 1),
        (3, base, "purchase", 1),
        # a touch AFTER the conversion gets nothing
        (4, base + H, "click", 1),
    ]
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type",
                                      "user_id"]).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "user_id")
    out = {r["channel"]: (r["n_touches"], r["total_credit"])
           for r in decay_attribution(df, half_life_s=3600.0).collect()}
    assert out == {"click": (1, round(2 / 3, 6)),
                   "view": (1, round(1 / 3, 6))}


def test_srm_check_contributions(spark):
    from data_ingest_spark.extensions.profile import srm_check
    df = spark.createDataFrame([(0,)] * 60 + [(1,)] * 40, ["arm"])
    out = {r["arm"]: r for r in srm_check(df).collect()}
    assert out[0]["observed"] == 60 and out[0]["expected"] == 50.0
    assert out[0]["chi2_contrib"] == 2.0 and out[1]["chi2_contrib"] == 2.0


def test_srm_check_rejects_out_of_domain_arms(spark):
    """Round-6 ADVICE (low): positional ratio-array indexing turned a
    string arm label or an out-of-range integer into silent NULL
    expected/chi2_contrib — the broken-assignment signal the gate
    exists to catch. The validated domain must FAIL the query loudly
    instead."""
    import pytest
    from data_ingest_spark.extensions.profile import srm_check
    for bad in [[("control",)] * 5 + [("treat",)] * 5,   # string labels
                [(0,)] * 5 + [(2,)] * 5,                 # index overflow
                [(-1,)] * 5 + [(1,)] * 5]:               # negative arm
        df = spark.createDataFrame(bad, ["arm"])
        with pytest.raises(Exception, match="srm_check"):
            srm_check(df, ratios=[0.5, 0.5]).collect()
    # the valid domain still flows
    ok = spark.createDataFrame([(0,)] * 6 + [(1,)] * 4, ["arm"])
    assert srm_check(ok).count() == 2


def test_hourly_xcorr_perfect_lag_tracking(spark):
    """Purchases exactly mirror clicks one hour later → r(lag 1) = 1;
    at lag 0 the series are deliberately anti-aligned."""
    from data_ingest_spark.extensions.profile import hourly_xcorr
    base = 1_700_000_000_000_000
    H = 3_600_000_000
    clicks = [3, 0, 5, 0, 7, 0]
    rows, eid = [], 0
    for h, c in enumerate(clicks):
        for _ in range(c):
            rows.append((eid, base + h * H, "click")); eid += 1
        for _ in range(c):   # same count, one hour later
            rows.append((eid, base + (h + 1) * H, "purchase")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "event_type")
    out = {r["lag_hours"]: r["pearson_r"]
           for r in hourly_xcorr(df).collect()}
    assert out[1] == 1.0
    assert out[0] < 0      # alternating series anti-correlate at lag 0


def test_cusum_changepoint_finds_planted_shift(spark):
    """A stream at 2/hour for 10 hours then 10/hour for 10 hours must
    peak |CUSUM| exactly at the shift boundary."""
    from data_ingest_spark.extensions.profile import cusum_changepoint
    base = 1_700_000_000_000_000
    H = 3_600_000_000
    rows, eid = [], 0
    for h in range(20):
        for _ in range(2 if h < 10 else 10):
            rows.append((eid, base + h * H + eid, "a")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "event_type")
    r = cusum_changepoint(df).collect()[0]
    # D_t = N·P_t − t·S peaks at t = 10 (hour index 9): |20·20 − 10·120|
    assert r["changepoint_hour"] == (base // (H)) + 9
    assert r["peak_cusum"] == abs(20 * 20 - 10 * 120)
    assert r["n_hours"] == 20


def test_kaplan_meier_textbook_example(spark):
    """5 users: durations 1,1,2,3 churned + one censored at duration
    4 (the corpus end). S(1) = 1−2/5 = 0.6; S(2) = 0.6·(1−1/3) = 0.4;
    S(3) = 0.4·(1−1/2) = 0.2."""
    from data_ingest_spark.extensions.evaluation import kaplan_meier
    base = 1_700_000_000_000_000
    D = 86_400_000_000
    # user 5 spans to day 4 (the corpus end) so the day-3 ender
    # churns while user 5 itself is censored
    spans = {1: (0, 1), 2: (0, 1), 3: (0, 2), 4: (0, 3), 5: (0, 4)}
    rows, eid = [], 0
    for u, (a, b) in spans.items():
        rows.append((eid, base + a * D, u)); eid += 1
        rows.append((eid, base + b * D, u)); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    out = {r["duration_days"]: (r["n_at_risk"], r["n_churned"],
                                r["survival"])
           for r in kaplan_meier(df).collect()}
    assert out[1] == (5, 2, 0.6)
    assert out[2] == (3, 1, 0.4)
    assert out[3] == (2, 1, 0.2)
    assert 4 not in out        # the censored user produces no row


def test_kaplan_meier_all_longest_lived_churned(spark):
    """Every max-duration user churned (deaths == at_risk at the last
    row): 1 − d/n is exactly 0 there, Spark's F.log(0) is NULL and an
    unguarded ln-sum would SKIP it, reporting the previous survival
    instead of 0 (round-6 ADVICE, medium). The guard must emit
    survival 0.0 at — and after — that row."""
    from data_ingest_spark.extensions.evaluation import kaplan_meier
    base = 1_700_000_000_000_000
    D = 86_400_000_000
    # users 1,2 span days 0-3 (dur 3, churned: last=3 < end=4);
    # user 3 spans day 4 only (dur 0, censored at the corpus end).
    # Histogram: dur 0 (n=1, deaths=0), dur 3 (n=2, deaths=2 = risk).
    spans = {1: (0, 3), 2: (0, 3), 3: (4, 4)}
    rows, eid = [], 0
    for u, (a, b) in spans.items():
        rows.append((eid, base + a * D, u)); eid += 1
        rows.append((eid, base + b * D, u)); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    out = {r["duration_days"]: (r["n_at_risk"], r["n_churned"],
                                r["survival"])
           for r in kaplan_meier(df).collect()}
    assert out == {3: (2, 2, 0.0)}


def test_kaplan_meier_window_is_partitioned(spark, capfd):
    """The histogram windows must keep a NON-FOLDABLE partition key:
    F.lit(1) is constant-folded out of the spec and Spark logs 'No
    Partition Defined for Window operation' (round-6 verdict ask #5).
    capfd sees the JVM's console log, so the warning is caught at the
    source."""
    from data_ingest_spark.extensions.evaluation import kaplan_meier
    base = 1_700_000_000_000_000
    D = 86_400_000_000
    rows = [(i, base + (i % 5) * D, i % 7) for i in range(40)]
    df = spark.createDataFrame(rows, ["event_id", "us", "user_id"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "user_id")
    capfd.readouterr()                       # drain earlier output
    kaplan_meier(df).collect()
    err = capfd.readouterr().err
    assert "No Partition Defined" not in err


def test_stratified_uplift_known_rates(spark):
    from data_ingest_spark.extensions.profile import stratified_uplift
    base = 1_700_000_000_000_000
    rows, eid = [], 0
    # 4 low-activity users (stratum 0): controls 10/12 convert at
    # 0/1... build: users 2,4 (arm 0) and 1,3 (arm 1); arm-0 users
    # convert, arm-1 don't
    for u in (1, 2, 3, 4):
        for k in range(5):
            t = "purchase" if (u % 2 == 0 and k == 0) else "view"
            rows.append((eid, base + eid, t, u)); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type",
                                      "user_id"]).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "user_id")
    r = stratified_uplift(df).collect()
    assert len(r) == 1 and r[0]["stratum"] == 0
    assert (r[0]["rate_control"], r[0]["rate_treat"]) == (1.0, 0.0)
    assert r[0]["uplift"] == -1.0


def test_seasonal_backtest_perfect_daily_cycle(spark):
    """A perfectly 24-periodic stream has mae_seasonal = 0 and
    mase = 0; a flat-then-trend stream favors naive-1."""
    from data_ingest_spark.extensions.profile import seasonal_naive_backtest
    base = 1_700_000_000_000_000
    H = 3_600_000_000
    rows, eid = [], 0
    for h in range(72):
        for _ in range((h % 24) % 3 + 1):     # period-24 pattern
            rows.append((eid, base + h * H, "cyclic")); eid += 1
    df = spark.createDataFrame(rows, ["event_id", "us", "event_type"]) \
        .select("event_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "event_type")
    r = seasonal_naive_backtest(df).collect()[0]
    assert r["mae_seasonal"] == 0.0 and r["mase"] == 0.0
    assert r["mae_naive1"] > 0
