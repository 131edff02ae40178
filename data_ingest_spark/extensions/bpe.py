"""Byte-pair-encoding tokenizer: distributed training + encoding.

The two halves of a real BPE tokenizer lifecycle, Spark-first:

- ``bpe_train``: learn the merge table from the corpus. Each round is
  one shuffle — adjacent-pair counts over the *vocabulary* table
  (word, frequency), the classic BPE trick that keeps every iteration
  O(|vocab|), not O(corpus) — plus a one-row driver reduction for the
  argmax merge (ties → lexicographically smallest pair, so training
  is fully deterministic). Genuinely iterative, hence a rows-only
  registry entry; parity is pinned by a hypothesis mirror against a
  sequential pure-Python BPE.

- ``bpe_encode``: apply a (trained or shipped) merge list. The merge
  application is a pure Catalyst array fold — one ``F.aggregate``
  pass per merge over the character array, whole-stage codegen, NO
  UDF anywhere — run once per *distinct* word and joined back to the
  corpus, then reassembled per document in token order. With a static
  merge artifact this is exactly reproducible in SQL (DuckDB
  ``list_reduce``), so encoding carries a full value oracle.

Left-to-right non-overlapping replacement (the BPE contract) falls
out of the fold naturally: ``acc`` ends with the left symbol and the
incoming element is the right symbol ⇒ replace the tail, else append.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_ingest_spark.extensions.text import tokens_col


def _char_seq(name: str) -> Column:
    """Character array of column ``name`` (1 char per element)."""
    return F.expr(f"transform(sequence(1, length({name})), "
                  f"i -> substr({name}, i, 1))")


def apply_merge(seq: Column, left: str, right: str) -> Column:
    """One BPE merge as a Catalyst fold: scan the token array left to
    right, replacing each non-overlapping (left, right) adjacency with
    the concatenated symbol. Pure expression — codegen, no UDF, and
    literal symbols go through ``F.lit`` so any corpus character is
    safe."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        do = ((F.size(acc) > 0)
              & (F.element_at(acc, -1) == F.lit(left))
              & (x == F.lit(right)))
        return F.when(do, F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                                   F.array(F.lit(merged)))
                      ).otherwise(F.concat(acc, F.array(x)))

    init = F.array().cast("array<string>")
    return F.aggregate(seq, init, step)


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(tokens_col(text_col)).alias("w"))
            .filter(F.length("w") >= 1)
            .groupBy("w").agg(F.count("*").alias("f")))


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over vocab sequences."""
    pairs = F.when(
        F.size("seq") > 1,
        F.expr("transform(sequence(1, size(seq) - 1), "
               "i -> struct(element_at(seq, i) AS l, "
               "element_at(seq, i + 1) AS r))")
    ).otherwise(F.expr(
        "CAST(array() AS array<struct<l: string, r: string>>)"))
    return (seqs.select(F.col("f"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("f").alias("pair_count")))


def bpe_train(df: DataFrame, n_merges: int = 8, text_col: str = "text",
              min_count: int = 2) -> DataFrame:
    """Learn ``n_merges`` BPE merges. Returns a DataFrame
    ``(rank, left, right, merged, pair_count)`` in training order.

    Each round: one vocabulary-sized shuffle (pair counts) and a
    TakeOrderedAndProject argmax collected as a single row — the
    standard iterative-training loop with the per-round working set
    bounded by |vocab|, never the corpus. Rounds stop early when the
    best pair drops under ``min_count``.

    Scheduling note for large vocabularies: the per-round
    ``limit(1).collect()`` launches ~2 jobs per merge, so a 32k-merge
    training run is ~64k tiny jobs — fine for the word-frequency table
    this operates on (rounds are sub-second), but if driver scheduling
    ever dominates, batch the loop: take the top-B NON-OVERLAPPING
    pairs per round (no shared left/right symbol) and apply them in
    one pass — the standard producer-side batching that preserves BPE
    semantics exactly for disjoint merges."""
    spark = df.sparkSession
    seqs = (_word_freqs(df, text_col)
            .select("f", _char_seq("w").alias("seq"))
            .localCheckpoint())
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (_pair_counts(seqs)
               .orderBy(F.col("pair_count").desc(), F.col("l").asc(),
                        F.col("r").asc())
               .limit(1).collect())
        if not top or top[0]["pair_count"] < min_count:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
        merges.append((rank, l, r, l + r, c))
        seqs = (seqs.select("f", apply_merge(F.col("seq"), l, r)
                            .alias("seq"))
                .localCheckpoint())
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, "
                "pair_count long")


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text",
               broadcast_vocab: bool = True) -> DataFrame:
    """Tokenize with a merge list: ``(id, n_tokens, tokens_str)`` with
    BPE tokens space-joined in document order.

    The fold chain runs once per DISTINCT word (the vocabulary table),
    then joins back to the corpus token stream — broadcast when the
    vocabulary fits (the common case: vocab grows ~log corpus), or a
    shuffle join via ``broadcast_vocab=False`` for open-vocabulary
    data. Reassembly is one grouped sort_array over (position, tokens)
    — a single corpus shuffle on the document id."""
    toks = (df.select(F.col(id_col),
                      F.posexplode(tokens_col(text_col))
                      .alias("pos", "w"))
            .filter(F.length("w") >= 1))
    seq = _char_seq("w")
    for left, right in merges:
        seq = apply_merge(seq, left, right)
    vocab = toks.select("w").distinct().select("w", seq.alias("toks"))
    enc = F.broadcast(vocab) if broadcast_vocab else vocab
    return (toks.join(enc, "w")
            .groupBy(id_col)
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                lambda s: s["toks"])).alias("_t"))
            .select(F.col(id_col),
                    F.size("_t").cast("long").alias("n_tokens"),
                    F.concat_ws(" ", "_t").alias("tokens_str")))
