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
