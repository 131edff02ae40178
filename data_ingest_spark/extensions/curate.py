"""End-to-end LLM corpus curation: the composed pipeline a training
run actually executes, built entirely from the extension operators so
the whole chain stays one lazy Spark plan.

Stages (each individually oracle-checked elsewhere; the composition is
oracle-checked as ``p3_curate``):

  1. PII redaction           — map-only regex scrub (text.pii_redact)
  2. Quality gate            — min whitespace-token count, map-only
  3. Exact dedup, keep-first — one shuffle on content hash
  4. Benchmark decontamination — n-gram overlap vs a held-out set,
                               benchmark side broadcast (dedup.decontaminate)
  5. Deterministic split     — content-addressed train/valid/test
                               assignment, map-only (sampling.hash_split)

100 TB posture: stages 1, 2, and 5 are narrow (scan-speed, no
shuffle); stage 3 shuffles (hash, id) pairs once; stage 4 shuffles
only shingle *hits*. Nothing collects to the driver; split assignment
is a pure function of (seed, doc_id) so reruns and incremental
arrivals never reshuffle existing examples across splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_ingest_spark.extensions.dedup import (decontaminate,
                                                dedup_keep_first)
from data_ingest_spark.extensions.sampling import hash_split
from data_ingest_spark.extensions.text import pii_redact, tokens_col

DEFAULT_SPLITS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def curate_corpus(docs: DataFrame, benchmark: DataFrame | None = None,
                  min_tokens: int = 30, shingle_k: int = 3,
                  weights: dict[str, float] | None = None,
                  seed: int = 42, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Run the full curation chain; returns
    ``(doc_id, split, n_tokens)`` for every surviving document."""
    weights = weights or DEFAULT_SPLITS
    # NOTE (r10, measured-REJECTED): widening the scan before the
    # scrub (spread / 8×-per-split repartition) looked right — the
    # triple-regex scrub runs at the scan's split count, 2 tasks at
    # sf1 — but an interleaved A/B at BOTH SFs showed it a wash at
    # sf1 (4.59 vs 4.34 s min-of-4; AQE overlaps the scrub's
    # materialization with the chain's other independent stage
    # futures, so the serial scrub wall is hidden) and a full
    # spread-to-32 ~0.7 s SLOWER at sf0.1 (every post-checkpoint
    # stage inherits the 32-block fan-out, pure dispatch on a 1.8 MB
    # corpus). At 100 TB the scan yields >= cores splits by itself.
    red = pii_redact(docs, id_col=id_col, text_col=text_col)
    clean = (red.select(id_col, F.col("clean_text").alias(text_col))
             .withColumn("n_tokens", F.size(tokens_col(text_col)))
             .filter(F.col("n_tokens") >= min_tokens)
             # ONE materialization of the scrubbed+gated corpus: the
             # triple-regex scrub is the most expensive map in the
             # chain and the plan references this frame from five
             # leaves (dedup hash side, dedup join-back, decontam
             # shingle side via kept, and the final output) — without
             # the checkpoint every leaf is its own parquet scan that
             # re-runs the regexes (the r9 plan showed 5 corpus scans,
             # each with the full scrub in its condition). Lazy, so
             # the first consumer's job pays it exactly once
             # (guide §5: reuse >> recompute for an expensive map).
             .localCheckpoint(eager=False))
    kept = dedup_keep_first(clean, id_col=id_col, text_col=text_col)
    if benchmark is not None:
        hits = decontaminate(kept, benchmark, k=shingle_k,
                             id_col=id_col, text_col=text_col)
        kept = kept.join(hits.select(id_col), id_col, "left_anti")
    out = hash_split(kept, id_col, weights, seed=seed)
    return out.select(id_col, "split",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


def training_prep(docs: DataFrame, budget: int = 512,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The tokenizer-facing end of the pipeline: perplexity gate →
    exact dedup → token counts → contiguous sequence packing, reported
    as per-training-sequence statistics ``(seq_id, n_docs,
    total_tokens, first_doc, last_doc)``.

    Composition of already-oracled stages: documents in the ``tail``
    perplexity tertile of their language drop (CCNet keep-head+middle),
    exact duplicates keep the smallest id, survivors pack contiguously
    at ``budget`` tokens per sequence via the distributed prefix sum
    (coarse ranges + offsets — no single-task window). Everything is
    deterministic, so the whole chain carries one value oracle.

    100 TB posture: two corpus shuffles for the gate (model + score),
    one for the dedup hash, one scan for token counts, and the packing
    prefix-sum's tiny per-range offset collect. No stage holds more
    than a vocabulary or a range map on the driver.
    """
    from data_ingest_spark.extensions.packing import pack_sequences
    from data_ingest_spark.extensions.text import perplexity_buckets

    keep = (perplexity_buckets(docs, id_col=id_col, text_col=text_col)
            .filter(F.col("bucket") != "tail")
            .select(id_col))
    gated = docs.join(keep, id_col, "left_semi")
    deduped = dedup_keep_first(gated, id_col=id_col, text_col=text_col)
    wt = deduped.select(F.col(id_col),
                        F.size(tokens_col(text_col)).alias("n_tokens"))
    packed = pack_sequences(wt, budget, order_col=id_col)
    return (packed.groupBy("seq_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc")))


#: The five English stopwords the Gopher-style gate probes for. A
#: quality English document of any length hits at least two.
GOPHER_STOPWORDS = ["the", "of", "and", "to", "in"]


def gopher_gate(docs: DataFrame, text_col: str = "text",
                lang_col: str = "lang",
                len_col: str = "n_chars") -> DataFrame:
    """Gopher-style (Rae 2021 §A1.1) document-quality rule gate as ONE
    map-only pass — five boolean rules plus the conjunction, kept
    per-rule so curation can report WHY a document failed:

      r_len      50 ≤ chars ≤ 20000
      r_wordlen  2 ≤ mean word length ≤ 12
      r_symbol   ≤ 25% non-alphanumeric-non-space chars (EN only —
                 CJK text is all non-[A-Za-z0-9], the rule would
                 reject every zh document)
      r_stop     ≥ 2 distinct probe stopwords present (EN only)
      r_distinct distinct-token ratio ≥ 0.30 (the map-only repetition
                 screen; the windowed n-gram gates are x33/x56)

    Everything is array/regex Column math over the tokens array — no
    shuffle, no UDF; at 100 TB this is a pure scan-side filter that
    fuses into whole-stage codegen."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    # NULL-hardening: a NULL lang makes (~is_en) NULL and a NULL
    # text/len makes every arithmetic rule NULL — filters would treat
    # the NULL `pass` as fail, but per-rule failure reporting and
    # pass-rate aggregates would silently skip those rows, breaking
    # the per-rule "WHY it failed" contract. Coalesce lang to '' and
    # every rule to FALSE so `pass` is never NULL.
    is_en = F.coalesce(F.col(lang_col), F.lit("")) == "en"
    mean_wl = F.col(len_col).cast("double") / n_tok
    nonal = F.length(F.regexp_replace(F.col(text_col),
                                      "[A-Za-z0-9 ]", ""))
    stop_hits = sum(
        (F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0))

    def _rule(c):
        return F.coalesce(c, F.lit(False))

    out = (docs
           .withColumn("r_len", _rule(F.col(len_col).between(50, 20000)))
           .withColumn("r_wordlen",
                       _rule((mean_wl >= 2.0) & (mean_wl <= 12.0)))
           # multiplication form, not nonal/len ≤ 0.25: exactly
           # equivalent for len > 0 (0.25 is dyadic, both sides exact
           # doubles) and still FALSE-free at len = 0, where the
           # division would yield NULL and poison `pass`
           .withColumn("r_symbol",
                       _rule((~is_en) | (nonal.cast("double")
                                         <= 0.25 * F.col(len_col))))
           .withColumn("r_stop", _rule((~is_en) | (stop_hits >= 2)))
           .withColumn("r_distinct",
                       _rule(F.size(F.array_distinct(toks)).cast("double")
                             / n_tok >= 0.30)))
    return out.withColumn(
        "pass", F.col("r_len") & F.col("r_wordlen") & F.col("r_symbol")
        & F.col("r_stop") & F.col("r_distinct"))
