"""Sequence packing and weighted mixing (extensions/packing.py)."""

from pyspark.sql import Window, functions as F

from data_ingest_spark.extensions.packing import pack_sequences, weighted_mix


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).cast("long").alias("n_tokens"))


def test_pack_matches_naive_global_window(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r["seq_id"] for r in
           pack_sequences(docs, budget=256, coarse_ranges=8).collect()}
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    naive = {r["doc_id"]: r["seq_id"] for r in docs.withColumn(
        "seq_id", F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                          / 256).cast("long")).collect()}
    assert got == naive


def test_pack_seq_ids_monotone_and_dense_enough(spark):
    docs = _docs(spark, 300)
    rows = sorted(pack_sequences(docs, budget=512).collect(),
                  key=lambda r: r["doc_id"])
    seqs = [r["seq_id"] for r in rows]
    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))  # no gaps


def test_pack_layout_independent(spark):
    docs = _docs(spark)
    a = {r["doc_id"]: r["seq_id"] for r in
         pack_sequences(docs, budget=300, coarse_ranges=4).collect()}
    b = {r["doc_id"]: r["seq_id"] for r in
         pack_sequences(docs.repartition(17), budget=300,
                        coarse_ranges=13).collect()}
    assert a == b


def test_weighted_mix_hits_targets(spark):
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string"))
        .alias("source"))
    out = weighted_mix(docs, {"s0": 1.0, "s1": 0.5, "s2": 0.0},
                       seed=3)
    counts = dict(out.groupBy("source").count().collect())
    assert counts.get("s0") == 1000          # keep-all is exact
    assert "s2" not in counts and "s3" not in counts
    assert abs(counts["s1"] / 1000 - 0.5) < 0.1


def test_chunking_covers_text_with_overlap(spark):
    from data_ingest_spark.extensions.text import chunk_documents
    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text), (2, "short")],
                               "doc_id long, text string")
    rows = sorted(chunk_documents(df, size=40, overlap=10).collect(),
                  key=lambda r: (r["doc_id"], r["chunk_idx"]))
    one = [r for r in rows if r["doc_id"] == 1]
    # starts step by size-overlap; reassembly of non-overlap parts
    # reproduces the document exactly
    assert [r["chunk_start"] for r in one] == [0, 30, 60]
    rebuilt = one[0]["chunk_text"] + "".join(
        r["chunk_text"][10:] for r in one[1:])
    assert rebuilt == text
    # consecutive chunks agree on their 10-char overlap
    for a, b in zip(one, one[1:]):
        assert a["chunk_text"][-10:] == b["chunk_text"][:10] or \
            len(a["chunk_text"]) < 40
    short = [r for r in rows if r["doc_id"] == 2]
    assert len(short) == 1 and short[0]["chunk_text"] == "short"


def test_chunk_reassemble_roundtrip(spark):
    from data_ingest_spark.extensions.text import (chunk_documents,
                                                   reassemble_chunks)
    rows = [(1, "abcdefghij" * 13),          # multi-chunk, ragged tail
            (2, "short"),                     # single chunk
            (3, "x" * 40),                    # exactly one chunk size
            (4, "y" * 41)]                    # one char past a boundary
    df = spark.createDataFrame(rows, "doc_id long, text string")
    back = reassemble_chunks(chunk_documents(df, size=40, overlap=10),
                             overlap=10)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)


def test_pack_sequences_matches_prefix_sum_hypothesis(spark):
    """Property: the distributed coarse-range prefix sum equals the
    sequential definition seq_id = floor(tokens_before / budget) on
    random token-count tables, for budgets that straddle doc sizes."""
    from hypothesis import given, settings, strategies as st

    from data_ingest_spark.extensions.packing import pack_sequences

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=30),
                    min_size=1, max_size=40),
           st.sampled_from([5, 16, 64]))
    def run(tokens, budget):
        docs = list(enumerate(tokens))
        df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
        got = {r["doc_id"]: r["seq_id"]
               for r in pack_sequences(df, budget).collect()}
        acc, want = 0, {}
        for d, n in docs:
            want[d] = acc // budget
            acc += n
        assert got == want, (tokens, budget)

    run()
