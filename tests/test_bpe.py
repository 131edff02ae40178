"""BPE tokenizer: distributed training + Catalyst-fold encoding vs a
sequential pure-Python mirror."""

import re

from data_ingest_spark.extensions.bpe import (bpe_encode, bpe_train,
                                              bpe_train_with_rounds)


def _apply(s, left, right):
    out = []
    for x in s:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _mirror_train(texts, n_merges, min_count=2):
    from collections import Counter
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                words[w] += 1
    seqs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((left, right))
        for w in seqs:
            seqs[w] = _apply(seqs[w], left, right)
    return merges


def _mirror_encode(text, merges):
    toks = []
    for w in re.split(r"\s+", text.lower()):
        if not w:
            continue
        s = list(w)
        for left, right in merges:
            s = _apply(s, left, right)
        toks += s
    return toks


def test_bpe_train_learns_classic_merges(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string")
    m = [(r["left"], r["right"], r["merged"], r["pair_count"])
         for r in bpe_train(df, n_merges=3).orderBy("rank").collect()]
    assert m == [("l", "o", "lo", 5), ("lo", "w", "low", 5),
                 ("e", "w", "ew", 4)]


def test_bpe_encode_applies_merges_in_order(spark):
    df = spark.createDataFrame([(7, "low lowest unseen")],
                               "doc_id long, text string")
    out = bpe_encode(df, [("l", "o"), ("lo", "w")]).collect()[0]
    assert out["tokens_str"] == "low low e s t u n s e e n"
    assert out["n_tokens"] == 11


def test_bpe_matches_python_mirror_hypothesis(spark):
    """Differential property: distributed train + encode equal the
    sequential mirror on random small-alphabet corpora (small alphabet
    makes merges frequent and tie-breaks exercised)."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=4))
    def run(texts):
        docs = list(enumerate(texts))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got_m = [(r["left"], r["right"])
                 for r in bpe_train(df, n_merges=4).orderBy("rank").collect()]
        assert got_m == _mirror_train(texts, 4), texts
        got_e = {r["doc_id"]: r["tokens_str"]
                 for r in bpe_encode(df, got_m).collect()}
        for d, t in docs:
            assert got_e[d] == " ".join(_mirror_encode(t, got_m)), (t, got_m)

    run()


def test_bpe_empty_and_single_char_words(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a b a")],
                               "doc_id long, text string")
    m = bpe_train(df, n_merges=3).collect()
    assert m == []  # no adjacent pairs anywhere
    enc = {r["doc_id"]: r["tokens_str"]
           for r in bpe_encode(df, [("a", "b")]).collect()}
    assert enc == {1: "a", 2: "a b a"}
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty).count() == 0
    assert bpe_encode(empty, [("a", "b")]).count() == 0


def test_bpe_batched_equals_sequential_on_fixture_corpus(spark):
    """Round-7 verdict ask #3: batched training (top-B disjoint safe
    prefix per round) must produce the bit-identical merge table to
    the sequential loop, in fewer driver rounds."""
    texts = ["low lower lowest low low slow flow",
             "new newer newest news renew",
             "bold older boulder gold fold molder",
             "the then there these them theme"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    seq_df, seq_rounds = bpe_train_with_rounds(df, n_merges=12)
    seq = [tuple(r) for r in seq_df.orderBy("rank").collect()]
    bat_df, bat_rounds = bpe_train_with_rounds(df, n_merges=12, batch=4)
    bat = [tuple(r) for r in bat_df.orderBy("rank").collect()]
    assert bat == seq
    assert not hasattr(bpe_train, "last_rounds")
    assert len(seq) == 12
    assert bat_rounds < seq_rounds


def test_bpe_batched_matches_mirror_hypothesis(spark):
    """The safe-prefix batch rule vs the pure-Python sequential mirror
    on adversarial tiny-alphabet corpora (maximal tie/conflict
    density — exactly where an unsound batch rule diverges)."""
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="ab", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=3),
           st.integers(min_value=2, max_value=5))
    def run(texts, b):
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
        got = [(r["left"], r["right"]) for r in
               bpe_train(df, n_merges=5, batch=b)
               .orderBy("rank").collect()]
        assert got == _mirror_train(texts, 5), (texts, b)

    run()


def test_select_batch_rules():
    """Unit pins for the safety rules: prefix contiguity, strict
    count trim against the first non-accepted candidate, tail bound
    for truncated collections."""
    from data_ingest_spark.extensions.bpe import _select_batch
    # disjoint prefix accepted; conflict ('lo' shares 'o'... actually
    # shares nothing) — ('o','w') conflicts with ('l','o') via 'o'
    cands = [("l", "o", 9), ("x", "y", 7), ("o", "w", 6), ("p", "q", 5)]
    assert _select_batch(cands, 4) == [("l", "o", 9), ("x", "y", 7)]
    # tie with the first non-accepted candidate trims the tail but
    # never the head
    cands = [("l", "o", 9), ("x", "y", 6), ("o", "w", 6)]
    assert _select_batch(cands, 4) == [("l", "o", 9)]
    # merged-symbol collision counts as a conflict: ("a","b") produces
    # "ab", so a later pair consuming symbol "ab" must end the prefix
    cands = [("a", "b", 9), ("ab", "c", 7)]
    assert _select_batch(cands, 4) == [("a", "b", 9)]
    # full top-K collection: unseen pairs bound the tail
    cands = [("l", "o", 9), ("x", "y", 4)]
    assert _select_batch(cands, 2, tail_bound=4) == [("l", "o", 9)]
    assert _select_batch(cands, 2, tail_bound=3) == \
        [("l", "o", 9), ("x", "y", 4)]
    # limit cap: the first over-limit candidate bounds the trim
    cands = [("l", "o", 9), ("x", "y", 7), ("p", "q", 7)]
    assert _select_batch(cands, 2) == [("l", "o", 9)]
