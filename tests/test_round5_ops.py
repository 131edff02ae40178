"""Round-5 operator additions: window skip-grams, the per-column
expectations gate, and corpus-global paragraph dedup with
first-occurrence survivorship."""

from pyspark.sql import functions as F

from data_ingest_spark.extensions.dedup import paragraph_dedup
from data_ingest_spark.extensions.profile import column_expectations
from data_ingest_spark.extensions.text import skipgram_pairs


def test_skipgram_pairs_window_and_weights(spark):
    # "a b c d": pairs (a,b,3) (a,c,2) (a,d,1) (b,c,3) (b,d,2) (c,d,3)
    df = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): (r["pair_count"], r["w_sum"])
           for r in skipgram_pairs(df, window=3, top_k=50,
                                   min_count=1).collect()}
    assert out == {("a", "b"): (1, 3), ("a", "c"): (1, 2),
                   ("a", "d"): (1, 1), ("b", "c"): (1, 3),
                   ("b", "d"): (1, 2), ("c", "d"): (1, 3)}


def test_skipgram_pairs_min_count_and_ranking(spark):
    df = spark.createDataFrame(
        [(i, "x y x y") for i in range(3)] + [(10, "p q")],
        ["doc_id", "text"])
    rows = skipgram_pairs(df, window=2, top_k=2, min_count=2).collect()
    # per doc "x y x y": (x,y)@d1 x2, (y,x)@d1, (x,x)@d2, (y,y)@d2
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in rows] == [
        ("x", "y", 6), ("x", "x", 3)]


def test_column_expectations_metrics(spark):
    df = spark.createDataFrame(
        [(1, "A-1"), (2, None), (3, "B-2"), (4, "bad")],
        ["k", "code"])
    out = {r["column"]: r for r in column_expectations(
        df, ["k", "code"], {"code": "^[A-Z]-[0-9]$"}).collect()}
    k, c = out["k"], out["code"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 0, 4)
    assert (k["min_value"], k["max_value"]) == ("1", "4")
    assert k["regex_match_frac"] is None
    assert (c["n_null"], c["null_frac"], c["n_distinct"]) == (1, 0.25, 3)
    # 2 of 4 rows match the rule (NULL and 'bad' do not)
    assert c["regex_match_frac"] == 0.5


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [(1, "shared intro. unique one"),
         (2, "shared intro. unique two"),
         (3, "unique three. unique three")],  # in-doc duplicate
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["clean_text"] == "shared intro. unique one"
    assert out[1]["n_dropped"] == 0
    # doc 2 loses the shared paragraph to doc 1
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_dropped"] == 1
    # the in-doc duplicate keeps only its first position
    assert out[3]["clean_text"] == "unique three"
    assert out[3]["n_dropped"] == 1


def test_paragraph_dedup_fully_duplicated_doc_empties(spark):
    df = spark.createDataFrame(
        [(1, "only para"), (2, "only para")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["clean_text"] == "only para"
    assert out[2]["clean_text"] == "" and out[2]["n_dropped"] == 1


def test_mrr_jackknife_known_values(spark):
    from data_ingest_spark.extensions.evaluation import mrr_jackknife
    # two queries: rr = 1 (rank 1) and 1/2 (rank 2) -> MRR = 0.75
    rows = [(1, 10.0, 1, True), (1, 9.0, 2, False),
            (2, 10.0, 3, False), (2, 9.0, 4, True)]
    df = spark.createDataFrame(
        rows, "user_id int, value double, event_id int, relevant boolean")
    r = mrr_jackknife(df, k=10).collect()[0]
    assert r["n_queries"] == 2 and r["mrr"] == 0.75
    # jackknife over {1, 0.5}: theta_{-i} = {0.5, 1}, se = 0.25
    assert r["se_jack"] == 0.25
    assert r["ci_lo"] == round(0.75 - 1.96 * 0.25, 9)
    assert r["ci_hi"] == round(0.75 + 1.96 * 0.25, 9)


def test_mrr_jackknife_single_query_has_zero_se(spark):
    from data_ingest_spark.extensions.evaluation import mrr_jackknife
    df = spark.createDataFrame(
        [(1, 5.0, 1, True)],
        "user_id int, value double, event_id int, relevant boolean")
    r = mrr_jackknife(df).collect()[0]
    assert (r["mrr"], r["se_jack"]) == (1.0, 0.0)


def test_classification_report_counts_and_f1(spark):
    from data_ingest_spark.extensions.evaluation import (
        classification_report)
    pairs = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "b")]
    df = spark.createDataFrame(pairs, "gold string, pred string")
    out = {r["label"]: r for r in classification_report(df).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_gold"], a["n_pred"], a["tp"]) == (2, 1, 1)
    assert (a["precision"], a["recall"]) == (1.0, 0.5)
    assert a["f1"] == round(2 * 1 / 3, 9)
    assert (b["n_gold"], b["n_pred"], b["tp"]) == (2, 4, 2)
    assert b["precision"] == 0.5 and b["recall"] == 1.0
    # class only in gold: zero precision/recall, no crash
    assert (c["n_pred"], c["tp"], c["precision"], c["f1"]) == (0, 0, 0.0, 0.0)


# ---- round-5b: eval metrics, interval merge, CDC chunking, spans ----

from data_ingest_spark.extensions.cdc import merge_intervals
from data_ingest_spark.extensions.evaluation import (auc_rank,
                                                     calibration_bins,
                                                     cohens_kappa)
from data_ingest_spark.extensions.text import cdc_chunk_stats, decontam_spans


def test_auc_rank_known_value(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.3)], ["label", "score"])
    r = auc_rank(df).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["n_tie_groups"]) == (2, 2, 0)
    assert r["auc"] == 0.75 and r["gini"] == 0.5


def test_auc_rank_midrank_ties(spark):
    # one positive and one negative at the same score: AUC = 0.5
    df = spark.createDataFrame([(1, 0.5), (0, 0.5)], ["label", "score"])
    r = auc_rank(df).collect()[0]
    assert r["n_tie_groups"] == 1 and r["auc"] == 0.5


def test_auc_rank_empty_and_one_class(spark):
    empty = spark.createDataFrame([], "label int, score double")
    r = auc_rank(empty).collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (0, 0, 0.0)
    ones = spark.createDataFrame([(1, 0.2), (1, 0.4)], ["label", "score"])
    assert auc_rank(ones).collect()[0]["auc"] == 0.0


def test_calibration_bins_exact_ratios(spark):
    df = spark.createDataFrame(
        [(1, 0.95), (0, 0.92), (1, 0.15), (0, 0.12)], ["label", "p"])
    rows = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(rows) == {1, 9}
    assert rows[9]["n"] == 2 and rows[9]["frac_pos"] == 0.5
    assert rows[9]["mean_p"] == 0.935
    assert rows[1]["mean_p"] == 0.135 and rows[1]["n_pos"] == 1


def test_cohens_kappa_perfect_and_chance(spark):
    same = spark.createDataFrame(
        [("A", "A"), ("B", "B")], ["rater_a", "rater_b"])
    assert cohens_kappa(same).collect()[0]["kappa"] == 1.0
    chance = spark.createDataFrame(
        [("A", "A"), ("A", "B"), ("B", "B"), ("B", "A")],
        ["rater_a", "rater_b"])
    r = cohens_kappa(chance).collect()[0]
    assert (r["n"], r["n_agree"], r["n_labels"]) == (4, 2, 2)
    assert r["kappa"] == 0.0


def test_merge_intervals_touching_and_disjoint(spark):
    df = spark.createDataFrame(
        [("k", 1, 5), ("k", 4, 8), ("k", 5, 6), ("k", 10, 12),
         ("j", 0, 1)],
        ["doc_id", "start", "end"])
    out = sorted((r["doc_id"], r["span_start"], r["span_end"],
                  r["n_merged"])
                 for r in merge_intervals(df).collect())
    # [1,5]+[4,8]+[5,6] chain (touch counts as overlap); [10,12] apart
    assert out == [("j", 0, 1, 1), ("k", 1, 8, 3), ("k", 10, 12, 1)]


def _cdc_mirror(text, window=4, mask=63, min_chunk=1):
    n = len(text)
    cuts, prev = [], 0
    for i in range(window, n + 1):
        h = 0
        for c in text[i - window:i]:
            h = h * 31 + ord(c)
        if h % (mask + 1) == 0 and i - prev >= min_chunk:
            cuts.append(i)
            prev = i
    full = [0] + cuts + ([n] if (not cuts or cuts[-1] < n or n == 0)
                         else [])
    lens = [full[i] - full[i - 1] for i in range(1, len(full))]
    bh = 0
    for c in cuts:
        bh = (bh * 1000003 + c) % 2147483647
    return len(lens), max(lens) if lens else 0, bh


def test_cdc_chunk_stats_matches_python_mirror(spark):
    texts = ["the quick brown fox jumps over the lazy dog " * 8,
             "abcd" * 40, "xy", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    for min_chunk in (1, 32):
        rows = {r["doc_id"]: r for r in cdc_chunk_stats(
            df, window=4, mask=63, min_chunk=min_chunk).collect()}
        for i, t in enumerate(texts):
            nc, mx, bh = _cdc_mirror(t, min_chunk=min_chunk)
            r = rows[i]
            assert (r["n_chunks"], r["max_chunk_len"],
                    r["boundary_hash"]) == (nc, mx, bh), (i, min_chunk)
            assert r["len_chars"] == len(t)


def test_cdc_chunk_stats_honors_window_param(spark):
    """Regression: the rolling hash must fold over exactly ``window``
    codepoints. The old kernel hardcoded the last 4 — window=6
    silently hashed a 4-gram and window=3 read cps[-1] via Python
    negative indexing (wrong cuts, no error)."""
    texts = ["the quick brown fox jumps over the lazy dog " * 6,
             "abc", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    for window in (2, 3, 6, 8):
        rows = {r["doc_id"]: r for r in cdc_chunk_stats(
            df, window=window, mask=63, min_chunk=1).collect()}
        for i, t in enumerate(texts):
            nc, mx, bh = _cdc_mirror(t, window=window, min_chunk=1)
            r = rows[i]
            assert (r["n_chunks"], r["max_chunk_len"],
                    r["boundary_hash"]) == (nc, mx, bh), (i, window)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cdc_chunk_stats(df, window=0)


def test_cdc_chunk_boundaries_shift_insensitive(spark):
    # inserting a prefix re-chunks only the first chunk: every cut in
    # the original that is >= window chars past the edit reappears
    # shifted by the insertion length
    base = "the quick brown fox jumps over the lazy dog " * 10
    ins = "INSERTED! " + base
    df = spark.createDataFrame([(0, base), (1, ins)], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in cdc_chunk_stats(
        df, window=4, mask=63, min_chunk=1).collect()}
    # mirror gives the actual cut lists to compare
    def cuts_of(t):
        out, prev = [], 0
        for i in range(4, len(t) + 1):
            h = 0
            for c in t[i - 4:i]:
                h = h * 31 + ord(c)
            if h % 64 == 0:
                out.append(i)
        return out
    c0, c1 = cuts_of(base), cuts_of(ins)
    shifted = [c + len("INSERTED! ") for c in c0]
    # all original cuts survive the shift (the defining CDC property)
    assert set(shifted) <= set(c1)
    assert rows[0]["n_chunks"] >= 2  # the rule actually fires


def test_decontam_spans_positions_and_runs(spark):
    bench = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "x x a b c d e y y"), (2, "no overlap here at all")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            decontam_spans(corpus, bench, k=3).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert (r["n_positions"], r["n_hits"]) == (7, 3)
    assert (r["first_hit_pos"], r["longest_run"]) == (2, 3)


def test_theil_sen_known_slopes(spark):
    from datetime import datetime
    from data_ingest_spark.operators.regression import theil_sen
    # user 1: values 0, 2, 4 at hours 0, 1, 2 -> every pairwise slope
    # is exactly 2/hour; user 2: 0, 10, 2 at hours 0, 1, 2 -> slopes
    # {10, 1, -8}, median 1 (robust to the outlier where OLS is not).
    rows = []
    for u, vals in ((1, [0.0, 2.0, 4.0]), (2, [0.0, 10.0, 2.0])):
        for i, v in enumerate(vals):
            rows.append((u * 10 + i, datetime(2024, 1, 1, i), u, v))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"])
    out = {r["user_id"]: (r["n_pairs"], r["theil_slope"])
           for r in theil_sen(df).collect()}
    assert out[1] == (3, 2.0)
    assert out[2] == (3, 1.0)


def test_theil_sen_even_pairs_avgs_middles(spark):
    from datetime import datetime
    from data_ingest_spark.operators.regression import theil_sen
    # 4 points at hours 0..3 with values 0,1,4,3: 6 slopes sorted are
    # [-1, 0.5, 1, 1, 2, 3] -> median = (1+1)/2 = 1.0; same-timestamp
    # pairs are excluded, not divided by zero.
    rows = [(i, datetime(2024, 1, 1, i), 7, v)
            for i, v in enumerate([0.0, 1.0, 4.0, 3.0])]
    rows.append((99, datetime(2024, 1, 1, 0), 7, 100.0))  # dup ts of e0
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"])
    row = theil_sen(df).collect()[0]
    # the dup-ts point adds 3 more finite pairs (vs e1..e3), total 9
    assert row["n_pairs"] == 9


def test_good_turing_spectrum_exact(spark):
    from data_ingest_spark.extensions.text import good_turing_spectrum
    # Shingle multiset engineered via single-token docs (each doc < 3
    # tokens -> its whole text is one shingle type): 'a' x3, 'b' x1,
    # 'c' x1, 'd' x2 => n_1=2, n_2=1, n_3=1, N=7.
    docs = [(i, t) for i, t in
            enumerate(["a", "a", "a", "b", "c", "d", "d"])]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["r"]: r for r in good_turing_spectrum(df).collect()}
    assert out[1]["n_r"] == 2 and out[2]["n_r"] == 1 and out[3]["n_r"] == 1
    # r*=  (r+1) * n_{r+1} / n_r : r=1 -> 2*1/2 = 1.0 ; r=2 -> 3*1/1 = 3
    assert out[1]["r_star"] == 1.0 and out[2]["r_star"] == 3.0
    assert out[3]["r_star"] is None  # n_4 = 0
    assert abs(out[1]["mass"] - round(2 / 7, 6)) < 1e-9


def test_zipf_fit_exact_power_law(spark):
    from data_ingest_spark.extensions.text import zipf_fit
    # Counts 8/4/2 at ranks 1/2/3 are not collinear in log-log, so
    # pin only sign and n here; the exact-slope check below uses two
    # points, where OLS passes through both.
    text = " ".join(["w1"] * 8 + ["w2"] * 4 + ["w3"] * 2)
    df = spark.createDataFrame([(0, text, "s")],
                               ["doc_id", "text", "source"])
    row = zipf_fit(df, top_k=3).collect()[0]
    assert row["n_ranked"] == 3 and row["zipf_slope"] < 0
    # two-point exact check: only two tokens -> slope exactly
    # (ln4 - ln8)/(ln2 - ln1) = -1 in the perfect Zipf case
    df2 = spark.createDataFrame(
        [(0, " ".join(["w1"] * 8 + ["w2"] * 4), "s")],
        ["doc_id", "text", "source"])
    import math
    row2 = zipf_fit(df2, top_k=2).collect()[0]
    assert abs(row2["zipf_slope"]
               - round((math.log(4) - math.log(8)) / math.log(2), 6)) < 1e-6


def test_resolve_entities_transitive_closure(spark):
    from data_ingest_spark.extensions.dedup import resolve_entities
    # k=1 makes the shingle set = the distinct token set, so overlap
    # is directly engineered: A~B and B~C are 8/12 = 0.667 >= 0.6 but
    # A~C is only 6/14 = 0.43 — the A-C link exists ONLY through the
    # component closure.
    a = "x y a1 a2 a3 a4 a5 a6 a7 a8"
    b = "x y a1 a2 a3 a4 a5 a6 b1 b2"
    c = "x y a1 a2 a3 a4 b1 b2 c1 c2"
    lone = "z w q1 q2 q3"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (9, lone)], ["doc_id", "text"])
    out = {r["doc_id"]: (r["entity_id"], r["n_members"])
           for r in resolve_entities(df, k=1).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[9] == (9, 1)


def test_resolve_entities_superblock_cap(spark):
    from data_ingest_spark.extensions.dedup import resolve_entities
    # Three identical docs would all match, but the block (their
    # shared first-2-token key) exceeds max_block=2 and is skipped
    # entirely -> three singleton entities.
    df = spark.createDataFrame(
        [(i, "same text here ok") for i in range(3)], ["doc_id", "text"])
    out = resolve_entities(df, k=1, max_block=2).collect()
    assert all(r["entity_id"] == r["doc_id"] and r["n_members"] == 1
               for r in out)


def _ppm(w, h, body: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_phash_flat_image_is_zero(spark):
    from data_ingest_spark.extensions.multimodal import decode_image, phash
    # A constant image has zero energy in every non-DC coefficient:
    # median 0, no coefficient strictly above it -> phash 0.
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(8, 8, bytes([100]) * (8 * 8 * 3))))],
        ["doc_id", "payload"])
    row = phash(decode_image(df)).collect()[0]
    assert row["phash"] == 0 and row["n_above"] == 0


def test_phash_identical_images_equal_translated_differ(spark):
    import hashlib
    from data_ingest_spark.extensions.multimodal import decode_image, phash
    body = (hashlib.md5(b"seed").hexdigest() * 9)[:10 * 6 * 3].encode()
    df = spark.createDataFrame(
        [(1, bytearray(_ppm(10, 6, body))),
         (2, bytearray(_ppm(10, 6, body))),
         (3, bytearray(_ppm(10, 6, body[::-1])))],
        ["doc_id", "payload"])
    out = {r["doc_id"]: r["phash"] for r in phash(decode_image(df)).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_phash_grayscale_path_matches_rgb_of_equal_channels(spark):
    from data_ingest_spark.extensions.multimodal import decode_image, phash
    # A PGM (1 channel) and a P6 whose R=G=B carry the same gray
    # raster -> identical hashes through the two channel branches.
    import hashlib
    gray = (hashlib.md5(b"gray").digest() * 4)[:64]
    rgb = bytes(v for v in gray for _ in range(3))
    pgm = b"P5\n8 8\n255\n" + gray
    df = spark.createDataFrame(
        [(1, bytearray(pgm)), (2, bytearray(_ppm(8, 8, rgb)))],
        ["doc_id", "payload"])
    out = {r["doc_id"]: (r["phash"], r["n_above"])
           for r in phash(decode_image(df)).collect()}
    assert out[1] == out[2]
    assert out[1][0] > 0


def test_phash_neardup_banding_has_perfect_recall(spark):
    from data_ingest_spark.extensions.multimodal import phash_neardup_pairs
    # 16-bit hashes, max_dist=2 -> 3 bands (6/6/4 bits by shift). The
    # (1,2) pair differs in bits 0 and 6 — one flip in band 0 and one
    # in band 1, so ONLY band 2 matches: the pigeonhole case. (1,3)
    # differs in 5 bits -> rejected; (1,4) identical -> hamming 0.
    h1 = 0b0000_0000_0000_0000
    h2 = h1 ^ (1 << 0) ^ (1 << 6)
    h3 = h1 ^ 0b11111
    df = spark.createDataFrame(
        [(1, h1), (2, h2), (3, h3), (4, h1)], ["doc_id", "phash"])
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_neardup_pairs(df, bits=16, max_dist=2).collect()}
    assert out == {(1, 2): 2, (2, 4): 2, (1, 4): 0}


def test_kneser_ney_known_values(spark):
    from data_ingest_spark.extensions.text import kneser_ney_bigrams
    # "a b a b a c": c(a,b)=2 c(b,a)=2 c(a,c)=1; ctx a:(3,2) b:(2,1);
    # continuation counts all 1; T=3 bigram types.
    df = spark.createDataFrame([(0, "a b a b a c")], ["doc_id", "text"])
    out = {(r["w1"], r["w2"]): (r["pair_count"], r["p_kn"])
           for r in kneser_ney_bigrams(df).collect()}
    assert out[("a", "b")] == (2, 0.583333)
    assert out[("b", "a")] == (2, 0.75)
    assert out[("a", "c")] == (1, 0.25)
    # KN sanity: P(.|a) sums to 1 (discount mass fully redistributed
    # over the continuation distribution restricted to seen types
    # here covers b and c only through their shared Pcont).


def test_ppjoin_finds_exact_and_near_pairs_only(spark):
    from data_ingest_spark.extensions.dedup import ppjoin
    # k=1 -> sets are distinct tokens. doc1/doc2 share 8 of 10 distinct
    # tokens (J = 8/12 = 0.667 >= 0.6); doc3 shares only 2 (J < 0.6).
    d1 = "t1 t2 t3 t4 t5 t6 t7 t8 u1 u2"
    d2 = "t1 t2 t3 t4 t5 t6 t7 t8 v1 v2"
    d3 = "t1 t2 w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ppjoin(df, k=1).collect()}
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] - round(8 / 12, 6)) < 1e-9


def test_ppjoin_identical_docs_jaccard_one(spark):
    from data_ingest_spark.extensions.dedup import ppjoin
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    out = ppjoin(df).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0


def test_kmv_timeline_lossless_below_capacity_and_monotone(spark):
    from datetime import datetime
    from data_ingest_spark.extensions.sketches import kmv_timeline
    # 3 users on day 1, 2 more on day 2, day 3 repeats day-1 users
    # only: exact cumulative = 3, 5, 5; k=64 >> 5 so the sketch is
    # lossless and the estimate equals the exact count.
    rows = []
    eid = 0
    for d, users in ((1, [1, 2, 3]), (2, [4, 5]), (3, [1, 2])):
        for u in users:
            rows.append((eid, datetime(2024, 3, d, 12), u, "x", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = {r["day"]: (r["n_exact"], r["kmv_estimate"])
           for r in kmv_timeline(df).collect()}
    assert out["2024-03-01"] == (3, 3.0)
    assert out["2024-03-02"] == (5, 5.0)
    assert out["2024-03-03"] == (5, 5.0)


def test_kmv_timeline_merge_equals_direct_sketch(spark):
    from datetime import datetime
    from data_ingest_spark.extensions.sketches import kmv_timeline
    # 40 users over 2 days with k=8: the day-2 estimate must equal a
    # from-scratch k=8 sketch of all 40 users (the merge identity),
    # which this recomputes independently with the same hash.
    rows = [(i, datetime(2024, 4, 1 + (i % 2), 6), i, "x", 1.0)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = {r["day"]: r["kmv_estimate"]
           for r in kmv_timeline(df, k=8).collect()}
    from data_ingest_spark.extensions.sketches import _h60, TWO_60
    from pyspark.sql import functions as F
    hs = sorted(r["_h"] for r in spark.createDataFrame(
        [(i,) for i in range(40)], ["user_id"])
        .select(_h60(F.col("user_id")).alias("_h")).collect())
    expected = round(7.0 / (hs[7] / TWO_60), 6)
    assert out["2024-04-02"] == expected


def test_bfs_hops_path_graph_and_unreachable(spark):
    from data_ingest_spark.operators.graph import bfs_hops
    # Path 1-2-3-4-5 with seed 1 -> hops 0..4; isolated pair 8-9 has
    # no seed -> NULL hops; max_hops=3 truncates node 5 to NULL.
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5"), ("8", "9")],
        ["src", "dst"])
    seeds = spark.createDataFrame([("1",)], ["id"])
    out = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert out == {"1": 0, "2": 1, "3": 2, "4": 3, "5": 4,
                   "8": None, "9": None}
    out3 = {r["id"]: r["hops"]
            for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out3["4"] == 3 and out3["5"] is None


def test_bfs_hops_nearest_of_multiple_seeds(spark):
    from data_ingest_spark.operators.graph import bfs_hops
    # Path 1-2-3-4-5 seeded at both ends: middle node is 2 from both.
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"), ("4", "5")], ["src", "dst"])
    seeds = spark.createDataFrame([("1",), ("5",)], ["id"])
    out = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds).collect()}
    assert out == {"1": 0, "2": 1, "3": 2, "4": 1, "5": 0}


def test_standardize_dims_known_values_and_zero_variance(spark):
    from data_ingest_spark.extensions.similarity import standardize_dims
    # dim 0: values 1,2,3 -> mean 2, pop-std sqrt(2/3); dim 1 is
    # constant -> z = 0 everywhere.
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [2.0, 5.0]), (3, [3.0, 5.0])],
        ["vec_id", "embedding"])
    out = {(r["vec_id"], r["dim"]): r["z"]
           for r in standardize_dims(df).collect()}
    import math
    sd = math.sqrt(2 / 3)
    assert out[(1, 0)] == round(-1 / sd, 6)
    assert out[(2, 0)] == 0.0
    assert out[(3, 0)] == round(1 / sd, 6)
    assert all(out[(i, 1)] == 0.0 for i in (1, 2, 3))


def test_log_odds_discriminative_term_ranks_first(spark):
    from data_ingest_spark.extensions.text import log_odds_terms
    # 'spam' dominates source A and never appears in B -> it must be
    # A's top term; the shared filler word scores near zero.
    df = spark.createDataFrame(
        [(1, "spam spam spam filler", "A"),
         (2, "spam spam filler filler", "A"),
         (3, "filler filler filler ham", "B"),
         (4, "ham ham filler filler", "B")],
        ["doc_id", "text", "source"])
    out = {}
    for r in log_odds_terms(df, top_k=2).collect():
        out.setdefault(r["source"], []).append((r["token"], r["z"]))
    assert out["A"][0][0] == "spam" and out["A"][0][1] > 0
    assert out["B"][0][0] == "ham" and out["B"][0][1] > 0


def test_mannwhitney_shifted_group_positive_z(spark):
    from data_ingest_spark.extensions.profile import mannwhitney_u
    # Group 'hi' holds the 5 largest of 10 distinct values: U is the
    # maximum 25, z positive; 'lo' is the mirror image with U = 0.
    rows = ([("lo", float(i)) for i in range(5)]
            + [("hi", float(i + 100)) for i in range(5)])
    df = spark.createDataFrame(rows, ["event_type", "value"])
    out = {r["event_type"]: (r["u_stat"], r["z"])
           for r in mannwhitney_u(df).collect()}
    assert out["hi"][0] == 25.0 and out["hi"][1] > 0
    assert out["lo"][0] == 0.0 and out["lo"][1] < 0
    assert out["hi"][1] == -out["lo"][1]


def test_charset_quality_flags_mojibake(spark):
    from data_ingest_spark.extensions.text import charset_quality
    df = spark.createDataFrame(
        [(1, "clean ascii text"),
         (2, "broken � bytes"),
         (3, "ctrl\x01chars"),
         (4, "café naïve résumé")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in charset_quality(df).collect()}
    assert out[1]["charset_ok"] and out[1]["n_non_ascii"] == 0
    assert not out[2]["charset_ok"] and out[2]["n_replacement"] == 1
    assert not out[3]["charset_ok"] and out[3]["n_control"] == 1
    assert out[4]["n_non_ascii"] == 4  # é ï é é


def test_last_touch_attribution_credit_and_direct(spark):
    from datetime import datetime
    from data_ingest_spark.extensions.evaluation import (
        last_touch_attribution)
    rows = [
        (1, datetime(2024, 1, 1, 9), 1, "click", 0.0, ""),
        (2, datetime(2024, 1, 1, 10), 1, "purchase", 1.0, ""),
        (3, datetime(2024, 1, 1, 9), 2, "view", 0.0, ""),
        (4, datetime(2024, 1, 1, 10), 2, "purchase", 1.0, ""),
        (5, datetime(2024, 1, 1, 11), 2, "purchase", 1.0, ""),
        (6, datetime(2024, 1, 1, 8), 3, "purchase", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    out = {r["touch_type"]: (r["n_conversions"], r["share"])
           for r in last_touch_attribution(df).collect()}
    # user 2's second purchase still credits 'view' (last NON-convert
    # touch), user 3 had no touch -> direct.
    assert out["click"] == (1, 0.25)
    assert out["view"] == (2, 0.5)
    assert out["direct"] == (1, 0.25)


def test_mutual_knn_pairs_reciprocal_only(spark):
    from data_ingest_spark.operators.neighbors import mutual_knn_pairs
    # a<->b reciprocal top-1; c's top-1 is a but a's is b -> excluded.
    knn = spark.createDataFrame(
        [("a", "b", 0.9, 1), ("b", "a", 0.9, 1), ("c", "a", 0.8, 1),
         ("a", "c", 0.8, 2)], ["src", "dst", "cosine", "rank"])
    out = mutual_knn_pairs(knn).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("a", "b")]


def test_stratified_kfold_balance_and_determinism(spark):
    from data_ingest_spark.extensions.sampling import stratified_kfold
    rows = [(i, "en" if i % 3 else "de") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_kfold(df, k=5).collect()
    by = {}
    for r in out:
        by.setdefault((r["stratum"], r["fold"]), 0)
        by[(r["stratum"], r["fold"])] += 1
    # en has 20 rows -> 4 per fold; de has 10 -> 2 per fold.
    assert all(by[("en", f)] == 4 for f in range(5))
    assert all(by[("de", f)] == 2 for f in range(5))
    again = stratified_kfold(df, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_vocab_coverage_exact_small_corpus(spark):
    from data_ingest_spark.extensions.text import vocab_coverage
    # counts: a=6, b=3, c=1 (N=10). Cum shares: 60%, 90%, 100%.
    df = spark.createDataFrame(
        [(0, " ".join(["a"] * 6 + ["b"] * 3 + ["c"]))],
        ["doc_id", "text"])
    out = {r["pct"]: (r["vocab_needed"], r["tokens_covered"])
           for r in vocab_coverage(df).collect()}
    assert out[50] == (1, 6)
    assert out[75] == (2, 9)
    assert out[90] == (2, 9)
    assert out[95] == (3, 10)
    assert out[99] == (3, 10)


def test_psi_drift_aa_split_near_zero_and_shift_detected(spark):
    from pyspark.sql import functions as F
    from data_ingest_spark.extensions.profile import psi_drift
    # A/A: identical distributions -> PSI ~ 0. A/B: ref in [0,50),
    # current in [100,150) -> all mass moves buckets, PSI large.
    rows = [(i, "t", float(i % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    aa = psi_drift(df).collect()[0]
    assert abs(aa["psi"]) < 0.01
    shifted = df.withColumn(
        "value", F.when(F.col("event_id") % 2 == 0, F.col("value"))
        .otherwise(F.col("value") + 100.0))
    ab = psi_drift(shifted).collect()[0]
    assert ab["psi"] > 1.0


def test_feature_hash_deterministic_and_mergeable(spark):
    from data_ingest_spark.extensions.text import feature_hash
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b a")], ["doc_id", "text"])
    out = {}
    for r in feature_hash(df).collect():
        out.setdefault(r["doc_id"], {})[r["dim"]] = r["weight"]
    # identical docs -> identical feature vectors; 'a' weight is
    # twice 'b'-independent sign*2
    assert out[1] == out[2]
    assert sorted(abs(w) for w in out[1].values()) == [1, 2]


def test_window_funnel_depths_and_window_cutoff(spark):
    from datetime import datetime, timedelta
    from data_ingest_spark.extensions.evaluation import window_funnel
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    def add(u, typ, hours):
        nonlocal eid
        rows.append((eid, t0 + timedelta(hours=hours), u, typ, 0.0, ""))
        eid += 1
    # u1 completes all 4 within the window.
    for h, t in ((0, "view"), (1, "click"), (2, "signup"), (3, "purchase")):
        add(1, t, h)
    # u2: clicks BEFORE viewing -> order violation, depth 1.
    add(2, "click", 0); add(2, "view", 1)
    # u3: full chain but purchase lands outside the 3h window.
    for h, t in ((0, "view"), (0.2, "click"), (0.4, "signup"),
                 (5, "purchase")):
        add(3, t, h)
    # u4: skips 'click' -> depth 1 even though signup/purchase exist.
    for h, t in ((0, "view"), (1, "signup"), (2, "purchase")):
        add(4, t, h)
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    out = {r["funnel_depth"]: r["n_users"]
           for r in window_funnel(
               df, ["view", "click", "signup", "purchase"],
               window_sec=10800).collect()}
    assert out == {4: 1, 1: 2, 3: 1}


def _funnel_mirror(events, steps, window_sec):
    """Greedy-earliest chain walked per user, literal iterative form
    (t1 = min step-1 ts; t_{i+1} = min step-(i+1) ts strictly after
    t_i, accepted only within window of t1) — the docstring spec,
    independent of the fold implementation."""
    from collections import defaultdict
    per = defaultdict(list)
    for u, typ, ts in events:
        per[u].append((typ, ts))
    hist = defaultdict(int)
    for u, evs in per.items():
        firsts = [ts for typ, ts in evs if typ == steps[0]]
        if not firsts:
            continue
        t1 = min(firsts)
        depth, tprev = 1, t1
        for step in steps[1:]:
            cand = [ts for typ, ts in evs if typ == step and ts > tprev]
            if not cand:
                break
            tn = min(cand)
            if tn - t1 > window_sec:
                break
            depth, tprev = depth + 1, tn
        hist[depth] += 1
    return dict(hist)


def test_window_funnel_fold_matches_iterative_mirror(spark):
    """Property check of the round-6 single-fold rewrite: on randomized
    event sets (ties, repeats, missing steps, out-of-order arrival) the
    sorted-collect fold must equal the literal per-step greedy-earliest
    walk."""
    import random
    from datetime import datetime, timedelta
    from data_ingest_spark.extensions.evaluation import window_funnel
    rng = random.Random(20260815)
    steps = ["view", "click", "signup", "purchase"]
    t0 = datetime(2024, 1, 1)
    for trial in range(5):
        events = []
        for u in range(40):
            for _ in range(rng.randint(0, 12)):
                typ = rng.choice(steps)
                # coarse hour grid forces ts ties within and across steps
                h = rng.randint(0, 9)
                events.append((u, typ, h * 3600))
        if not events:
            continue
        window_sec = rng.choice([3600, 3 * 3600, 10 * 3600])
        expected = _funnel_mirror(events, steps, window_sec)
        rows = [(i, t0 + timedelta(seconds=s), u, typ, 0.0, "")
                for i, (u, typ, s) in enumerate(events)]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value",
                   "props"])
        got = {r["funnel_depth"]: r["n_users"]
               for r in window_funnel(df, steps,
                                      window_sec=window_sec).collect()}
        assert got == expected, (trial, window_sec)
