"""Evaluation / curation operators: ranking metrics, vote aggregation,
preference pairs, incremental rollup state, mix quotas, epoch shuffle."""

import math

from pyspark.sql import functions as F

from data_ingest_spark.extensions.cdc import agg_state, merge_agg_state
from data_ingest_spark.extensions.evaluation import (
    dcg_weights_fp, idcg_prefix_fp, majority_vote, preference_pairs,
    ranking_metrics)
from data_ingest_spark.extensions.packing import mix_quota
from data_ingest_spark.extensions.sampling import epoch_shuffle


def test_ranking_metrics_known_values(spark):
    # group 1: relevant at ranks 2 and 3 (scores 9, 8); k=10.
    rows = [(1, 10, 10.0, False), (1, 11, 9.0, True), (1, 12, 8.0, True),
            # group 2: no relevant -> rr = ndcg = 0, NULL first rank.
            (2, 20, 5.0, False),
            # group 3: single relevant at rank 1 -> perfect scores.
            (3, 30, 1.0, True)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, value double, relevant boolean")
    out = {r["user_id"]: r for r in ranking_metrics(df).collect()}
    w, i = dcg_weights_fp(10), idcg_prefix_fp(10)
    assert out[1]["first_rel_rank"] == 2
    assert out[1]["rr"] == 0.5
    expected = round((w[1] + w[2]) / i[1], 9)
    assert out[1]["ndcg_k"] == expected
    # sanity against the float formula (fixed-point error < 1e-8)
    float_ndcg = ((1 / math.log2(3) + 1 / math.log2(4))
                  / (1 / math.log2(2) + 1 / math.log2(3)))
    assert abs(out[1]["ndcg_k"] - float_ndcg) < 1e-8
    assert out[2]["first_rel_rank"] is None
    assert out[2]["rr"] == 0.0 and out[2]["ndcg_k"] == 0.0
    assert out[3]["rr"] == 1.0 and out[3]["ndcg_k"] == 1.0


def test_majority_vote_tiebreak_and_agreement(spark):
    rows = [("i1", "a"), ("i1", "a"), ("i1", "b"),
            ("i2", "b"), ("i2", "a")]  # tie -> label asc wins
    df = spark.createDataFrame(rows, "item string, label string")
    out = {r["item"]: r for r in majority_vote(df).collect()}
    assert out["i1"]["majority_label"] == "a"
    assert out["i1"]["votes"] == 2 and out["i1"]["total_votes"] == 3
    assert out["i1"]["agreement"] == round(2 / 3, 9)
    assert out["i2"]["majority_label"] == "a"  # tie broken by label asc
    assert out["i2"]["agreement"] == 0.5


def test_preference_pairs_ties_and_margin(spark):
    rows = [(1, 10, 1.0), (1, 11, 3.0), (1, 12, 3.0),  # chosen tie -> min id
            (2, 20, 2.0), (2, 21, 2.0),                # degenerate: no pair
            (3, 30, 5.0)]                              # single row: no pair
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    out = {r["user_id"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {1}
    assert out[1]["chosen_id"] == 11      # ties on score -> smallest id
    assert out[1]["rejected_id"] == 10
    assert out[1]["margin"] == 2.0


def test_merge_agg_state_equals_full_recompute(spark):
    rows = [(1, "a", 1.5, "2024-01-01 00:00:00"),
            (1, "a", 2.25, "2024-01-05 00:00:00"),
            (1, "b", -1.0, "2024-01-02 00:00:00"),
            (2, "a", 0.5, "2024-01-09 00:00:00")]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    keys = ["user_id", "event_type"]
    cut = F.lit("2024-01-03 00:00:00").cast("timestamp")
    merged = merge_agg_state(agg_state(df.filter(F.col("ts") < cut), keys),
                             agg_state(df.filter(F.col("ts") >= cut), keys),
                             keys)
    full = agg_state(df, keys)
    m = {(r["user_id"], r["event_type"]): r for r in merged.collect()}
    f = {(r["user_id"], r["event_type"]): r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k]["cnt"] == f[k]["cnt"]
        assert m[k]["sum_value"] == f[k]["sum_value"]  # exact DECIMAL
        assert m[k]["min_ts"] == f[k]["min_ts"]
        assert m[k]["max_ts"] == f[k]["max_ts"]


def test_merge_agg_state_key_only_on_one_side(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, "2024-01-01 00:00:00")],
        "user_id int, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    empty = df.filter(F.lit(False))
    merged = merge_agg_state(agg_state(empty, ["user_id", "event_type"]),
                             agg_state(df, ["user_id", "event_type"]),
                             ["user_id", "event_type"]).collect()
    assert len(merged) == 1 and merged[0]["cnt"] == 1


def test_mix_quota_largest_remainder_and_prefix(spark):
    rows = [("s1", 1, 60), ("s1", 2, 30), ("s1", 3, 30),
            ("s2", 4, 100), ("s2", 5, 1),
            ("s3", 6, 500)]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tokens int")
    # 300 across 3 sources: 100 each, no remainder.
    out = mix_quota(df, budget=300).collect()
    assert {r["quota"] for r in out} == {100}
    s1 = sorted([r for r in out if r["source"] == "s1"],
                key=lambda r: r["cum_tokens"])
    # s1 prefix by (tokens desc, id asc): 60 then 90 fit, 120 busts.
    assert [r["doc_id"] for r in s1] == [1, 2]
    assert [r["cum_tokens"] for r in s1] == [60, 90]
    # s2 keeps exactly the 100-token doc (cum == quota); the next doc
    # (cum 101) busts. s3's single 500-token doc never fits.
    assert [r["doc_id"] for r in out if r["source"] == "s2"] == [4]
    assert not [r for r in out if r["source"] == "s3"]
    # every kept row respects its quota
    assert all(r["cum_tokens"] <= r["quota"] for r in out)


def test_mix_quota_remainder_goes_to_first_sources(spark):
    rows = [(s, i + 10 * ord(s[1]), 10)
            for s in ("s1", "s2", "s3") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, doc_id int, n_tokens int")
    out = mix_quota(df, budget=100).collect()
    quotas = {r["source"]: r["quota"] for r in out}
    # base 33, remainder 1 -> first source in name order gets 34.
    assert quotas == {"s1": 34, "s2": 33, "s3": 33}
    kept = {s: len([r for r in out if r["source"] == s]) for s in quotas}
    # 10-token docs: 3 fit under 33/34 (cum 30), the 4th (40) busts.
    assert kept == {"s1": 3, "s2": 3, "s3": 3}


def test_epoch_shuffle_is_permutation_and_seed_sensitive(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id int")
    out = epoch_shuffle(df, seed=17, num_shards=8).collect()
    assert sorted(r["pos"] for r in out) == list(range(100))
    assert all(r["shard"] == r["pos"] % 8 for r in out)
    # deterministic across evaluations
    again = epoch_shuffle(df, seed=17, num_shards=8).collect()
    assert {r["doc_id"]: r["pos"] for r in out} == \
        {r["doc_id"]: r["pos"] for r in again}
    # a different seed produces a different permutation
    other = epoch_shuffle(df, seed=18, num_shards=8).collect()
    assert {r["doc_id"]: r["pos"] for r in out} != \
        {r["doc_id"]: r["pos"] for r in other}


def test_round3b_operators_survive_empty_input(spark):
    """Empty-input robustness for the evaluation/curation family."""
    eev = spark.createDataFrame(
        [], "user_id long, event_id long, value double, relevant boolean")
    assert ranking_metrics(eev).count() == 0
    assert preference_pairs(eev).count() == 0
    evotes = spark.createDataFrame([], "item string, label string")
    assert majority_vote(evotes).count() == 0
    edocs = spark.createDataFrame([], "source string, doc_id long, n_tokens long")
    assert mix_quota(edocs, budget=100).count() == 0
    eids = spark.createDataFrame([], "doc_id long")
    assert epoch_shuffle(eids).count() == 0
    ests = spark.createDataFrame(
        [], "user_id long, event_type string, value double, ts timestamp")
    keys = ["user_id", "event_type"]
    assert merge_agg_state(agg_state(ests, keys), agg_state(ests, keys),
                           keys).count() == 0


def test_ranking_metrics_matches_python_mirror_hypothesis(spark):
    """Differential property: windowed MRR/NDCG@10 equals a sequential
    Python mirror (same fixed-point weights) on random result lists."""
    from hypothesis import given, settings, strategies as st

    def mirror(rows, k=10):
        w, i = dcg_weights_fp(k), idcg_prefix_fp(k)
        by_g = {}
        for g, eid, score, rel in rows:
            by_g.setdefault(g, []).append((-score, eid, rel))
        out = {}
        for g, lst in by_g.items():
            lst.sort()
            first = next((r + 1 for r, (_, _, rel) in enumerate(lst) if rel),
                         None)
            nrel = sum(1 for _, _, rel in lst if rel)
            dcg = sum(w[r] for r, (_, _, rel) in enumerate(lst[:k]) if rel)
            rr = round(1.0 / first, 9) if first else 0.0
            ndcg = (round(dcg / i[min(nrel, k) - 1], 9) if nrel else 0.0)
            out[g] = (first, nrel, rr, ndcg)
        return out

    row = st.tuples(st.sampled_from([1, 2]), st.integers(0, 50),
                    st.sampled_from([0.5, 1.0, 2.5]), st.booleans())

    @settings(max_examples=8, deadline=None)
    @given(st.lists(row, min_size=1, max_size=14, unique_by=lambda r: r[1]))
    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id int, event_id int, value double, relevant boolean")
        got = {r["user_id"]: (r["first_rel_rank"], r["n_relevant"],
                              r["rr"], r["ndcg_k"])
               for r in ranking_metrics(df).collect()}
        assert got == mirror(rows), rows

    run()


def test_length_buckets_waste_accounting(spark):
    from data_ingest_spark.extensions.packing import length_buckets
    rows = [(1, 10), (2, 64), (3, 65), (4, 100), (5, 600), (6, 700)]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = {r["bucket"]: r for r in length_buckets(df).collect()}
    # bucket 0: tokens <= 64 -> docs 1,2; pad 64; waste 128-74=54
    assert out[0]["n_docs"] == 2 and out[0]["pad_target"] == 64
    assert out[0]["waste_tokens"] == 54
    assert out[0]["waste_frac"] == round(54 / 128, 9)
    # bucket 1: (64,128] -> docs 3,4; pad 128
    assert out[1]["n_docs"] == 2 and out[1]["waste_tokens"] == 256 - 165
    # overflow bucket 4: pad target = bucket max (700)
    assert out[4]["pad_target"] == 700
    assert out[4]["waste_tokens"] == 1400 - 1300


def test_soft_dedup_weights_inverse_cluster_size(spark):
    from data_ingest_spark.extensions.dedup import soft_dedup_weights
    rows = [(1, "same"), (2, "same"), (3, "same"), (4, "only")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: (r["cluster_size"], r["weight"])
           for r in soft_dedup_weights(df).collect()}
    third = round(1 / 3, 9)
    assert out[1] == (3, third) and out[2] == (3, third)
    assert out[4] == (1, 1.0)
    # expected mass per distinct content is exactly one unit
    assert round(sum(w for _, w in out.values()), 6) == 2.0


def test_hard_negatives_excludes_same_label(spark):
    from data_ingest_spark.extensions.similarity import hard_negatives
    rows = [(1, [1.0, 0.0], 0), (2, [0.99, 0.1], 0),   # same label pair
            (3, [0.9, 0.2], 1), (4, [0.0, 1.0], 1)]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int")
    out = {(r["vec_id"], r["rank"]): r["neg_id"]
           for r in hard_negatives(df, k=1).collect()}
    # vec 1's nearest is vec 2 (same label, excluded) -> vec 3
    assert out[(1, 1)] == 3
    assert out[(3, 1)] == 2   # cos(3,2)=0.993 beats cos(3,1)=0.976
    assert out[(4, 1)] == 2   # only label-0 vecs allowed; 2 is nearest


def test_ngram_novelty_duplicates_score_zero(spark):
    from data_ingest_spark.extensions.dedup import ngram_novelty
    rows = [(1, "a b c d e"), (2, "a b c d e"),      # exact copy of 1
            (3, "x y z w v"),                         # all fresh
            (4, "a b c x y z q r s")]                # mixes old + new
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert out[1]["novelty"] == 1.0          # first occurrence wins
    assert out[2]["novelty"] == 0.0          # the copy owns nothing
    assert out[3]["novelty"] == 1.0
    # doc 4: shingles 'a b c' (first in 1) and 'x y z' (first in 3)
    # are old; the other 5 are new
    assert out[4]["n_shingles"] == 7
    assert out[4]["n_novel"] == 5
    assert out[4]["novelty"] == round(5 / 7, 9)


def test_source_overlap_counts_shared_content(spark):
    from data_ingest_spark.extensions.profile import source_overlap
    rows = [("s1", "alpha"), ("s1", "beta"), ("s2", "alpha"),
            ("s2", "gamma"), ("s3", "alpha"), ("s3", "beta")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(df).collect()}
    assert got == {("s1", "s2"): 1, ("s1", "s3"): 2, ("s2", "s3"): 1}
