"""Text analysis operators over a `documents(doc_id, text, ...)` table.

All operators are pure Column expressions (JVM-side, whole-stage
codegen, no Python UDFs) and deterministic, so each has an exact DuckDB
oracle. Tokenization is whitespace-based; hashing is md5-of-utf8 so
both engines agree byte-for-byte.

100 TB posture: everything here is a map-only stage over the documents
table except `simhash` (one explode + one groupBy(doc_id) shuffle,
proportional to token count) — no global state, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Small deterministic stopword lists used by quality scoring and the
# language-ID heuristic. Kept tiny on purpose: the operator contract is
# the scoring *mechanism*; swap in real lists at deployment.
STOPWORDS_EN = ["the", "a", "is", "of", "and", "to", "in", "it"]
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "is", "of", "and", "it"],
    "es": ["el", "los", "las", "y", "es", "que"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": ["de", "shi", "le", "bu", "zai", "you"],
}


def tokens_col(text_col: str = "text") -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def shingles_col(text_col: str = "text", k: int = 3) -> Column:
    """Word k-shingles (k consecutive tokens joined by a space). A
    document shorter than k tokens yields one shingle = the whole
    document."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    windows = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(k)])
    )
    return F.when(F.size(toks) >= k, windows).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_rows(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """``(id, shingle)`` distinct word-``k``-shingle membership rows —
    the Arrow fast path for ``explode(array_distinct(shingles_col))``.

    Spark evaluates higher-order array lambdas (transform/concat over
    a token array) interpreted, not codegen, which makes the Column
    shingle expression the hot spot of every dedup-family operator.
    This kernel does the identical computation (split on ``\\s+`` of
    the lower-cased text — leading/trailing empty tokens preserved
    exactly as Spark's ``split``/DuckDB's ``string_split_regex`` do —
    k-windows joined by space, short docs collapse to one whole-doc
    shingle, per-doc distinct) in Python over Arrow batches: ~7×
    faster at sf0.1 and embarrassingly parallel. Input is spread to
    defaultParallelism first so small scans don't starve cores.

    Case-folding note: Python ``str.lower`` and Spark/DuckDB ``lower``
    agree on ASCII (and all simple 1:1 Unicode mappings); locale-style
    multi-char folds (e.g. ``İ``) are out of contract — match the
    engines' behavior before relying on it for non-ASCII corpora."""
    import re

    from pyspark.sql.types import StringType, StructField, StructType

    from data_ingest_spark.functions.partitioning import spread

    out_schema = StructType([df.schema[id_col],
                             StructField("shingle", StringType())])
    ws = re.compile(r"\s+")

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids_out, sh_out = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(t.lower())
                if len(toks) >= k:
                    seen = {" ".join(toks[j:j + k])
                            for j in range(len(toks) - k + 1)}
                else:
                    seen = {" ".join(toks)}
                ids_out.extend([i] * len(seen))
                sh_out.extend(seen)
            yield pd.DataFrame({id_col: ids_out, "shingle": sh_out})

    return spread(df.select(id_col, text_col)).mapInPandas(gen, out_schema)


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """BPE-ish token count: maximal runs of letters, digits, or a single
    other non-space character (the pre-tokenizer split every BPE-family
    tokenizer applies before merges)."""
    # Four backslashes: Python -> SQL literal -> regex \s (Spark SQL
    # string literals consume one escape level).
    pat = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"
    return df.withColumn(
        out_col,
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{pat}', 0)")),
    )


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0, 1]:
    whitespace token count, mean token length, punctuation ratio,
    stopword ratio. The score rewards length (saturating at 100
    tokens), low punctuation density, and natural-language stopword
    density — the standard cheap quality gate for LLM corpus filtering."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(text_col)
    punct = F.length(F.regexp_replace(F.lower(F.col(text_col)),
                                      "[a-z0-9\\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct_ratio = punct / n_chars
    stop_ratio = n_stop / n_tok
    score = (0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
             + 0.4 * (1.0 - punct_ratio) + 0.3 * stop_ratio)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "pred_lang") -> DataFrame:
    """Marker-token language ID: score each candidate language by its
    marker-token hits, predict the argmax (ties broken alphabetically),
    'und' (undetermined) when no marker hits at all."""
    toks = tokens_col(text_col)

    def _contains_any(markers: list[str]):
        arr = F.array(*[F.lit(x) for x in markers])
        return lambda t: F.array_contains(arr, t)

    scores = {
        lang: F.size(F.filter(toks, _contains_any(markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # Reverse alphabetical fold so the FIRST alphabetical max wins.
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, F.when(best > 0, pred).otherwise(F.lit("und")))


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 3,
                keep: int = 5, out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 over the `keep` smallest distinct
    shingle hashes (a deterministic min-k sketch — the winnowing idea
    with a global instead of rolling window). Two documents share a
    fingerprint iff their `keep` smallest shingle hashes coincide."""
    hashes = F.array_sort(F.array_distinct(F.transform(
        shingles_col(text_col, k), lambda s: F.md5(s.cast("binary")))))
    return df.withColumn(
        out_col,
        F.md5(F.concat_ws(",", F.slice(hashes, 1, keep)).cast("binary")),
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            out_col: str = "simhash") -> DataFrame:
    """Nibble-weight SimHash: each token votes (nibble − 7.5) on each of
    the first 16 hex digits of its md5; a dimension's bit is 1 iff the
    weighted vote sum is positive. Returns a 16-char '0'/'1' string.
    Near-duplicate documents agree on most bits (compare via Hamming
    distance on the bit string).

    One doc-level hash repartition by id, then explode + groupBy(id) —
    the explode + md5 + nibble votes run full-parallel on the
    repartition output (a small local parquet scans as 1-2 tasks
    otherwise), and the groupBy reuses the id-partitioning with NO
    further exchange: the only shuffle moves raw docs, not token
    rows — the scalable SimHash shape (no per-pair work)."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    tok = (df.repartition(n_part, F.col(id_col))
           .select(id_col, F.explode(tokens_col(text_col)).alias("_tok")))
    tok = tok.withColumn("_h", F.md5(F.col("_tok").cast("binary")))
    bits = []
    for pos in range(1, 17):
        nib = F.expr(f"instr('0123456789abcdef', substr(_h, {pos}, 1)) - 1")
        bits.append(F.when(F.sum(nib - 7.5) > 0, "1").otherwise("0")
                    .alias(f"_b{pos}"))
    agg = tok.groupBy(id_col).agg(*bits)
    return agg.select(
        id_col,
        F.concat(*[F.col(f"_b{p}") for p in range(1, 17)]).alias(out_col),
    )


def tf_idf(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
           min_df: int = 1) -> DataFrame:
    """(doc_id, token, tf, df_count, tfidf) — classic smoothed TF-IDF:
    tf = term occurrences within the document, idf = ln((1+N)/(1+df))+1
    (sklearn's smooth_idf), tfidf = tf·idf.

    Plan shape: one explode of tokens, one groupBy(doc, token) for tf
    (map-side combined), one groupBy(token) for df joined back
    broadcast-or-shuffle by token. N rides along as a literal computed
    from a scalar count — no per-row subqueries, two shuffles total.
    At 100 TB both shuffles key on token; hot tokens (stopwords) are
    exactly the rows `min_df` pruning and stopword filtering drop
    first."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    # N rides along as a broadcast 1-row aggregate (no driver-side
    # .count() — the plan stays lazy and the corpus is scanned once).
    n_docs = df.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n"))
    dfreq = (tf.groupBy("token")
             .agg(F.count("*").alias("df_count"))
             .filter(F.col("df_count") >= min_df))
    idf = (F.log((F.lit(1.0) + F.col("_n"))
                 / (F.lit(1.0) + F.col("df_count"))) + F.lit(1.0))
    return (tf.join(dfreq, "token")
            .crossJoin(F.broadcast(n_docs))
            .select(id_col, "token", "tf", "df_count",
                    (F.col("tf") * idf).alias("tfidf")))


def bm25(df: DataFrame, query_terms: list[str], k1: float = 1.2,
         b: float = 0.75, top_k: int = 10, id_col: str = "doc_id",
         text_col: str = "text") -> DataFrame:
    """(token, doc_id, tf, score, rank) — Okapi BM25 retrieval scores
    for a broadcast query-term set, top-``top_k`` documents per term.
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Lucene formulation,
    always positive); score = idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Plan shape: one explode, one groupBy(doc) for document lengths
    (map-side combined), one groupBy(doc, token) for tf RESTRICTED to
    the broadcast query terms (so the tf shuffle carries only matching
    postings, not the corpus vocabulary), a tiny per-term df aggregate,
    and one rank window partitioned by term. N and avgdl ride along as
    a broadcast 1-row aggregate — corpus scanned once, no driver-side
    counts. Scores round to 6dp BEFORE ranking (tie-break doc id), the
    repo's cross-engine rank convention."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("token"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").cast("double").alias("_n"),
                   F.avg("dl").alias("_avgdl"))
    qt = F.array(*[F.lit(t) for t in query_terms])
    tf = (toks.filter(F.array_contains(qt, F.col("token")))
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df_count"))
    idf = F.log(F.lit(1.0)
                + (F.col("_n") - F.col("df_count") + F.lit(0.5))
                / (F.col("df_count") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") / F.col("_avgdl")))
    score = F.round(idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom, 6)
    scored = (tf.join(dl, id_col)
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats))
              .select("token", id_col, "tf", score.alias("score")))
    w = W.partitionBy("token").orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("token", id_col, "tf", "score",
                    F.col("rank").cast("int").alias("rank")))


# PII patterns deliberately restricted to syntax with identical
# semantics in Java regex (Spark) and RE2 (DuckDB): character classes,
# bounded repetition, \d, word boundaries.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d ()-]{7,}\d",
}


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace emails, IPv4 addresses, and international
    phone numbers with ``[EMAIL]`` / ``[IP]`` / ``[PHONE]`` tokens and
    count each redaction class. Returns
    ``(doc_id, clean_text, n_email, n_ipv4, n_phone)``.

    Map-only codegen stage (regexp_extract_all + regexp_replace, no
    UDF, no shuffle): at 100 TB this runs at parquet scan speed and
    pushes down the column projection. Patterns are applied
    longest-capture-first (email before phone) so a digit-bearing email
    local-part is not double-redacted."""
    # F.regexp_extract_all with a lit pattern (not F.expr) so the Java
    # regex reaches the engine unmangled by SQL string-literal escapes.
    counts = {
        name: F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }
    clean = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, f"[{name.upper()[:5]}]")
    return df.select(
        F.col(id_col), clean.alias("clean_text"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


def bpe_pair_counts(df: DataFrame, top_k: int = 50,
                    text_col: str = "text") -> DataFrame:
    """First iteration of BPE vocabulary training: global counts of
    adjacent character pairs inside words, weighted by word frequency.
    Returns the ``top_k`` pairs as ``(pair, pair_count)`` with a
    deterministic tie-break on the pair string.

    Plan shape: explode tokens → groupBy(word) count (map-side
    combined, so the pair stage works on the *vocabulary*, not the
    corpus — the classic BPE trick) → explode character pairs of each
    vocab word → groupBy(pair) weighted sum → top-k. Two shuffles, both
    keyed on low-cardinality keys; the corpus-sized explode never
    leaves the scan stage. All-integer arithmetic, so exact across
    engines."""
    words = (df.select(F.explode(tokens_col(text_col)).alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count("*").alias("f")))
    pairs = words.select(
        F.explode(F.expr(
            "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"
        )).alias("pair"),
        F.col("f"))
    counts = pairs.groupBy("pair").agg(F.sum("f").alias("pair_count"))
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a driver merge of k rows — no single-task window.
    return counts.orderBy(F.col("pair_count").desc(),
                          F.col("pair").asc()).limit(top_k)


LOGP_SCALE = 1_000_000


def unigram_logprob(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Perplexity-proxy quality score: per-document mean token
    log-probability under the corpus's own add-1-smoothed unigram
    model (low = gibberish / rare-token soup, high = typical text).
    Returns ``(doc_id, n_tokens, avg_logprob)``.

    Determinism at the float boundary: each token's log-probability is
    fixed-pointed once (round(ln(p)·1e6) as int64) in the *model*, so
    the per-document reduction is an integer sum — exact in any
    summation order and across engines; the single rounding of the
    final mean is the only float step.

    Plan shape: explode → groupBy(token) count (the model, map-side
    combined) → broadcast-or-shuffle join back onto tokens → one
    groupBy(doc). The model's two scalars (total count, vocab size)
    ride along via a 1-row cross join, keeping the plan fully lazy."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("token"))
    model = toks.groupBy("token").agg(F.count("*").alias("c"))
    scal = model.agg(F.sum("c").alias("tot"),
                     F.count("*").alias("v"))
    logp = (model.crossJoin(F.broadcast(scal))
            .select("token",
                    F.round(F.log((F.col("c") + F.lit(1.0))
                                  / (F.col("tot") + F.col("v")))
                            * LOGP_SCALE)
                    .cast("long").alias("logp_i")))
    return (toks.join(logp, "token")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.round(F.sum("logp_i")
                         / F.count("*") / LOGP_SCALE, 6)
                 .alias("avg_logprob")))


def intra_doc_repetition(df: DataFrame, k: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition gate: the fraction of a
    document's word ``k``-grams that are repeats of a ``k``-gram seen
    earlier in the SAME document (``(total − distinct) / total``).
    High values mark degenerate text — loops, keyword stuffing, OCR
    stutter — that LLM curation drops before training. Complements
    :func:`boilerplate_score`, which measures *cross*-document
    commonality. Returns ``(id, n_ngrams, n_distinct,
    dup_ngram_ratio)``.

    Plan shape: map-only — zero shuffles, zero state; the ideal shape
    for a first-pass quality filter. The per-row kernel runs in Python
    over Arrow batches (mapInPandas) rather than as a Column
    expression: Spark evaluates higher-order array lambdas
    interpreted, which measured ~10× slower than the Arrow path on
    this exact computation (the shingle_rows lesson). Short docs
    (< k tokens) collapse to one whole-doc n-gram, giving ratio 0
    rather than a null."""
    import re

    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from data_ingest_spark.functions.partitioning import spread

    out_schema = StructType([df.schema[id_col],
                             StructField("n_ngrams", LongType()),
                             StructField("n_distinct", LongType()),
                             StructField("dup_ngram_ratio", DoubleType())])
    ws = re.compile(r"\s+")

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids, ns, ds, rs = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(t.lower())
                if len(toks) >= k:
                    grams = [" ".join(toks[j:j + k])
                             for j in range(len(toks) - k + 1)]
                else:
                    grams = [" ".join(toks)]
                n, d = len(grams), len(set(grams))
                ids.append(i); ns.append(n); ds.append(d)
                rs.append(round((n - d) / n, 6))
            yield pd.DataFrame({id_col: ids, "n_ngrams": ns,
                                "n_distinct": ds, "dup_ngram_ratio": rs})

    return spread(df.select(id_col, text_col)).mapInPandas(gen, out_schema)


def boilerplate_score(df: DataFrame, k: int = 3, min_df: int = 5,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Template/boilerplate detector: the fraction of a document's
    distinct ``k``-shingles that are corpus-common (appear in ≥
    ``min_df`` documents). Docs near 1.0 are templated — headers,
    licenses, scraped nav chrome — the rows a curation pass
    down-weights or drops. Returns
    ``(doc_id, n_shingles, n_common, common_ratio)``.

    Plan shape: one distinct-shingle explode, a groupBy(shingle)
    document-frequency aggregate, a join back on shingle (the df table
    is shingle-keyed — AQE broadcasts it when small), and a final
    groupBy(doc). Integer counts + one rounded ratio, so the oracle is
    exact."""
    sh = (shingle_rows(df, id_col=id_col, text_col=text_col, k=k)
          .withColumnRenamed("shingle", "_sh"))
    dfreq = sh.groupBy("_sh").agg(F.count("*").alias("_df"))
    marked = sh.join(dfreq, "_sh").select(
        id_col, (F.col("_df") >= min_df).cast("long").alias("_common"))
    return (marked.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.sum("_common").alias("n_common"))
            .select(id_col, "n_shingles", "n_common",
                    F.round(F.col("n_common") / F.col("n_shingles"), 6)
                    .alias("common_ratio")))


def bigram_lm(df: DataFrame, top_k: int = 100,
              text_col: str = "text") -> DataFrame:
    """Count-based bigram LM estimation: corpus-wide bigram counts and
    the conditional probability P(w2 | w1) = c(w1 w2) / c(w1·) — the
    classic n-gram LM training step (the model behind cheap perplexity
    filters). Returns the ``top_k`` bigrams by count (ties broken on
    the pair) as ``(w1, w2, pair_count, cond_prob)``.

    Plan shape: bigrams explode scan-side from the token array (no
    self-join on position — adjacent pairs come from one pass over
    each document), one groupBy(w1, w2) with map-side combine; the
    left-marginal c(w1·) derives from that aggregate with a second
    small shuffle on w1. Counts are integers; the single division is
    rounded once — exact oracle."""
    toks = tokens_col(text_col)
    pairs = F.expr(
        "transform(sequence(1, size(_tk) - 1), "
        "i -> struct(element_at(_tk, i) AS w1, "
        "element_at(_tk, i + 1) AS w2))")
    bg = (df.select(toks.alias("_tk"))
          .filter(F.size("_tk") >= 2)
          .select(F.explode(pairs).alias("_bg"))
          .select("_bg.w1", "_bg.w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    marg = counts.groupBy("w1").agg(F.sum("pair_count").alias("_c1"))
    return (counts.join(marg, "w1")
            .select("w1", "w2", "pair_count",
                    F.round(F.col("pair_count") / F.col("_c1"), 6)
                    .alias("cond_prob"))
            .orderBy(F.desc("pair_count"), "w1", "w2").limit(top_k))


def tokenize_with_vocab(df: DataFrame, vocab_size: int = 1000,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Corpus tokenization: build a frequency-ranked word vocabulary
    (id = dense rank, most frequent = 0, ties broken by token) and map
    every document to its id sequence; out-of-vocabulary tokens map to
    -1. Returns ``(doc_id, ids_csv, n_tokens, n_oov)`` with the id
    sequence in document order.

    Plan shape: one explode → groupBy(token) count (map-side combined)
    → top-``vocab_size`` via TakeOrderedAndProject → rank window over
    the *vocabulary* (bounded by vocab_size, never the corpus) → the
    vocab broadcasts back onto the exploded tokens → one
    groupBy(doc_id) rebuilds sequences. Two corpus-sized shuffles
    total; the vocabulary is the only driver-adjacent object and is
    capped by construction."""
    from data_ingest_spark.operators.windows import dense_ids_scalable
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(text_col)).alias("pos", "token"))
    counts = (toks.groupBy("token").agg(F.count("*").alias("c"))
              .orderBy(F.col("c").desc(), F.col("token").asc())
              .limit(vocab_size))
    # two-pass rank (no global window): bucket by -count, rank tokens
    # within each count bucket, shift by the collected prefix sums —
    # same (count desc, token asc) order, parallel across buckets.
    vocab = (dense_ids_scalable(
        counts.withColumn("_negc", -F.col("c")),
        order=["_negc", "token"], id_col="tid").drop("_negc"))
    mapped = (toks.join(F.broadcast(vocab.select("token", "tid")),
                        "token", "left")
              .select(id_col, "pos",
                      F.coalesce(F.col("tid"), F.lit(-1)).alias("tid")))
    seq = F.transform(
        F.sort_array(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s["tid"].cast("string"))
    return (mapped.groupBy(id_col)
            .agg(F.concat_ws(",", seq).alias("ids_csv"),
                 F.count("*").cast("long").alias("n_tokens"),
                 F.sum((F.col("tid") == -1).cast("long")).alias("n_oov")))


def chunk_documents(df: DataFrame, size: int = 512, overlap: int = 64,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size character chunks with
    overlap: chunk i covers [i*(size-overlap), i*(size-overlap)+size).
    Emits (id, chunk_idx, chunk_start, chunk_text, n_chunk_chars).

    Pure codegen: sequence + explode + substring — the chunk explosion
    happens scan-side with no shuffle and no UDF, so a 100 TB corpus
    chunks at read speed and the output inherits the input
    partitioning (chunks of one doc stay in one partition)."""
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    step = size - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text_col) - F.lit(overlap)) / F.lit(step))
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    out = df.select(F.col(id_col), F.length(text_col).alias("_len"),
                    F.col(text_col).alias("_t"), idx)
    start = (F.col("chunk_idx") * step).cast("int")
    chunk = F.substring(F.col("_t"), start + 1, size)
    return out.select(
        F.col(id_col), F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("n_chunk_chars"))


def reassemble_chunks(chunks: DataFrame, overlap: int = 64,
                      id_col: str = "doc_id") -> DataFrame:
    """Inverse of :func:`chunk_documents`: rebuild each document from
    its chunks by ordering on chunk_idx and dropping the first
    ``overlap`` characters of every chunk after the first. With the
    same ``overlap`` used to chunk, ``reassemble(chunk(df)) == df``
    exactly (pinned by the roundtrip test) — the guarantee a RAG/
    training pipeline needs before it dares store only chunks.

    One groupBy(id): chunks collect per document (documents are
    driver-bounded units, not corpus-bounded — the same envelope the
    chunker's consumers already assume), sort by index in the array
    domain, trim, concatenate. No UDF; array_sort + transform +
    concat_ws stay JVM-side."""
    trimmed = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
        lambda s: F.when(s["chunk_idx"] == 0, s["chunk_text"])
        .otherwise(F.substring(s["chunk_text"], overlap + 1, 1 << 30)))
    return (chunks.groupBy(id_col)
            .agg(F.concat_ws("", trimmed).alias("text")))


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", lang_col: str = "lang",
                       n_buckets: int = 3) -> DataFrame:
    """CCNet-style per-language perplexity bucketing: score every
    document by mean token log-probability under its OWN language's
    add-1 unigram model, then split each language into equal-count
    quality tertiles — ``head`` (most typical text), ``middle``,
    ``tail`` (rare-token soup / gibberish). CCNet keeps head+middle
    for LM training and drops tail; the bucket label is the standard
    curation signal.

    Determinism follows :func:`unigram_logprob`: token log-probs are
    fixed-pointed once in the model (int64), the per-document
    reduction is an integer sum, and the NTILE ordering ties break on
    the id — identical across engines and partitionings.

    Plan: explode → groupBy(lang, token) model → per-lang scalars
    broadcast back → one groupBy(doc) → one window per lang. The
    model is vocabulary-sized (tiny next to the corpus); the window
    partitions by language, so no global sort — at 100 TB each
    language's rank runs in its own shuffle partition set, and a
    skewed dominant language can be pre-split by ntile-on-sample if
    ever needed.

    Returns ``(doc_id, lang, n_tokens, avg_logprob, bucket)``.
    """
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col), F.col(lang_col).alias("lang"),
                     F.explode(tokens_col(text_col)).alias("token"))
    model = toks.groupBy("lang", "token").agg(F.count("*").alias("c"))
    scal = model.groupBy("lang").agg(F.sum("c").alias("tot"),
                                     F.count("*").alias("v"))
    logp = (model.join(F.broadcast(scal), "lang")
            .select("lang", "token",
                    F.round(F.log((F.col("c") + F.lit(1.0))
                                  / (F.col("tot") + F.col("v")))
                            * LOGP_SCALE)
                    .cast("long").alias("logp_i")))
    scored = (toks.join(logp, ["lang", "token"])
              .groupBy(id_col, "lang")
              .agg(F.count("*").cast("long").alias("n_tokens"),
                   F.round(F.sum("logp_i")
                           / F.count("*") / LOGP_SCALE, 6)
                   .alias("avg_logprob")))
    w = W.partitionBy("lang").orderBy(F.col("avg_logprob").desc(),
                                      F.col(id_col).asc())
    names = {1: "head", 2: "middle", 3: "tail"}
    tile = F.ntile(n_buckets).over(w)
    bucket = tile.cast("string") if n_buckets != 3 else (
        F.when(tile == 1, names[1]).when(tile == 2, names[2])
        .otherwise(names[3]))
    return scored.select(id_col, "lang", "n_tokens", "avg_logprob",
                         bucket.alias("bucket"))


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document Shannon entropy of the token distribution —
    ``H = ln(n) − (Σ c·ln c)/n`` over the document's own token
    histogram. Low entropy flags degenerate text (one token repeated;
    keyword stuffing) independently of any corpus model: the
    complement of :func:`unigram_logprob` (which scores typicality
    against the corpus) and :func:`intra_doc_repetition` (which
    scores n-gram repeats).

    Determinism: each count's ``ln c`` is fixed-pointed once
    (round(ln(c)·1e6) as int64), so the per-document reduction is an
    integer sum — exact in any order and across engines; the final
    subtraction and rounding are the only float steps.

    Plan: explode → groupBy(doc, token) histogram → one groupBy(doc).
    Two corpus shuffles, both map-side combined; no global state.

    Returns ``(doc_id, n_tokens, entropy)``.
    """
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("token"))
    hist = toks.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    lnc_i = F.round(F.log("c") * LOGP_SCALE).cast("long")
    return (hist.groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.sum(F.col("c") * lnc_i).alias("_s"))
            .select(id_col, "n_tokens",
                    F.round(F.log("n_tokens")
                            - F.col("_s") / F.col("n_tokens") / LOGP_SCALE,
                            6).alias("entropy")))


def canonical_url(url_col: str = "url") -> Column:
    """Web-crawl URL canonicalization — the first dedup key of every
    crawl pipeline (CCNet/C4 dedup by normalized URL before any
    content hashing). Normalization steps, each expressible
    identically in Spark SQL and DuckDB (regexp + list ops only):

    1. drop the ``#fragment``;
    2. lower-case the scheme and host, strip a leading ``www.``;
    3. strip trailing ``/`` runs from the path;
    4. drop ``utm_*`` tracking params, sort the survivors, and
       re-join (a query-less URL keeps no ``?``).

    Pure map-side Column expression (codegen, no UDF): canonicalizing
    100 TB of URLs is scan-bound."""
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(rest, "^([^/?]*)", 1)), "^www\\.", "")
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1),
                            "/+$", "")
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (~p.startswith("utm_")) & (p != F.lit("")))
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))


def doc_keywords(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", top_k: int = 3) -> DataFrame:
    """Per-document keyword extraction: the ``top_k`` tokens by
    TF-IDF within each document (idf = ln(N/df), score = tf·idf,
    ties broken alphabetically). The per-doc sibling of the
    corpus-level ``tf_idf`` — this is the "tag every document with
    its salient terms" step behind topic bucketing and index-time
    keyword boosting. Returns (doc_id, token, tf, score, rank).

    Plan shape: one explode → groupBy(doc, token) for tf (map-side
    combined) → groupBy(token) for df → broadcast df back → the rank
    window partitions by doc_id (parallel across documents, never
    global). Score rounds to 6dp before ranking, the repo's
    cross-engine rank convention."""
    toks = df.select(F.col(id_col),
                     F.explode(tokens_col(text_col)).alias("token"))
    n_docs = df.select(id_col).agg(
        F.count("*").cast("double").alias("_n"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))
    score = F.round(
        F.col("tf") * F.log(F.col("_n") / F.col("_df")), 6)
    scored = (tf.join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(n_docs))
              .select(id_col, "token", "tf", score.alias("score")))
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select(id_col, "token", F.col("tf").cast("long").alias("tf"),
                    "score", F.col("rank").cast("int").alias("rank")))


def pmi_collocations(df: DataFrame, top_k: int = 50, min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Collocation mining: the ``top_k`` adjacent bigrams by count
    (ties broken on the pair) with their pointwise mutual information
    PMI = ln(P(ab) / (P(a)·P(b))) — the phrase-discovery statistic
    behind multi-word tokenizer entries and stop-phrase lists. The
    ratio is assembled from exact integer counts as one
    numerator/denominator pair (c_ab·N² and n_pairs·c_a·c_b), so the
    single ln + divide is the only float step. Returns
    ``(w1, w2, pair_count, pmi)``.

    Plan: bigrams explode scan-side (adjacent pairs from one pass —
    the bigram_lm shape), one groupBy(w1, w2) map-side combined; the
    unigram marginals and the two scalar totals derive from small
    aggregates that broadcast back."""
    toks = tokens_col(text_col)
    pairs = F.expr(
        "transform(sequence(1, size(_tk) - 1), "
        "i -> struct(element_at(_tk, i) AS w1, "
        "element_at(_tk, i + 1) AS w2))")
    tok_rows = df.select(toks.alias("_tk"))
    uni = (tok_rows.select(F.explode("_tk").alias("w"))
           .groupBy("w").agg(F.count("*").alias("cw")))
    totals = uni.agg(F.sum("cw").cast("long").alias("_n_tok"))
    bg = (tok_rows.filter(F.size("_tk") >= 2)
          .select(F.explode(pairs).alias("_bg"))
          .select("_bg.w1", "_bg.w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    n_pairs = counts.agg(F.sum("pair_count").cast("long").alias("_n_bg"))
    top = (counts.filter(F.col("pair_count") >= min_count)
           .orderBy(F.desc("pair_count"), "w1", "w2").limit(top_k))
    scored = (top
              .join(uni.select(F.col("w").alias("w1"),
                               F.col("cw").alias("_ca")), "w1")
              .join(uni.select(F.col("w").alias("w2"),
                               F.col("cw").alias("_cb")), "w2")
              .crossJoin(F.broadcast(totals))
              .crossJoin(F.broadcast(n_pairs)))
    # Multiply as DOUBLES (left-assoc, the same IEEE op sequence the
    # oracle uses): an int64 product pair·n_tok² overflows BIGINT past
    # ~3e9 corpus tokens — exactly where the scale story needs it —
    # while the double product rounds identically in every engine.
    num = (F.col("pair_count").cast("double")
           * F.col("_n_tok").cast("double")
           * F.col("_n_tok").cast("double"))
    den = (F.col("_n_bg").cast("double")
           * F.col("_ca").cast("double")
           * F.col("_cb").cast("double"))
    return scored.select(
        "w1", "w2", F.col("pair_count").cast("long").alias("pair_count"),
        F.round(F.log(num / den), 6).alias("pmi"))


def skipgram_pairs(df: DataFrame, window: int = 3, top_k: int = 50,
                   min_count: int = 5, text_col: str = "text") -> DataFrame:
    """Window-``window`` skip-gram co-occurrence counts — the training
    statistic behind word2vec/GloVe-style embedding corpora (x103's
    PMI is the adjacent-only special case). For each token position i
    and each offset d ∈ 1..window, the ordered pair (t[i], t[i+d])
    counts once with an EXACT INTEGER proximity weight
    ``window + 1 − d`` (linear decay — integer so the weight sums are
    summation-order-independent and engine-exact, the x103/x77
    fixed-point discipline). Returns the ``top_k`` pairs with
    ``pair_count ≥ min_count``: (w1, w2, pair_count, w_sum), ranked by
    (pair_count desc, w1, w2).

    Plan: pairs explode scan-side from one pass over the token arrays
    (a fixed ``window``-way unroll per position — no token self-join,
    no per-document state), then ONE map-side-combined groupBy(w1, w2)
    whose post-shuffle volume is the distinct-pair census; the top-k
    is a TakeOrdered over that bounded aggregate. At corpus scale this
    is a single linear shuffle."""
    toks = tokens_col(text_col)
    pairs = F.expr(
        f"flatten(transform(sequence(1, size(_tk) - 1), i -> "
        f"transform(sequence(1, least({int(window)}, size(_tk) - i)), "
        f"d -> struct(element_at(_tk, i) AS w1, "
        f"element_at(_tk, i + d) AS w2, "
        f"{int(window)} + 1 - d AS wt))))")
    bg = (df.select(toks.alias("_tk"))
          .filter(F.size("_tk") >= 2)
          .select(F.explode(pairs).alias("_p"))
          .select("_p.w1", "_p.w2", "_p.wt"))
    counts = (bg.groupBy("w1", "w2")
              .agg(F.count("*").cast("long").alias("pair_count"),
                   F.sum("wt").cast("long").alias("w_sum")))
    return (counts.filter(F.col("pair_count") >= min_count)
            .orderBy(F.desc("pair_count"), "w1", "w2").limit(top_k))


def cdc_chunk_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 4,
                    mask: int = 63, min_chunk: int = 32) -> DataFrame:
    """Content-defined chunking statistics: split each document at
    positions where a polynomial rolling hash of the last ``window``
    characters lands on 0 mod (``mask``+1) — the Rabin/FastCDC
    boundary rule that makes chunk edges INSENSITIVE to byte shifts,
    so an insertion early in a document re-chunks only one chunk
    instead of shifting every fixed-size block (the property delta
    dedup at 100 TB depends on). Boundaries closer than ``min_chunk``
    to the previous cut are suppressed (FastCDC's min-size rule).
    Returns ``(doc_id, n_chunks, len_chars, avg_chunk_len,
    max_chunk_len, boundary_hash)`` where avg is the exact
    len/n_chunks ratio and boundary_hash is a positional checksum of
    the cut list (so two engines must agree on every cut, not just
    the count).

    Exactness: hash(i) folds base-31 over the last ``window``
    codepoints (for window=4: ((c1·31 + c2)·31 + c3)·31 + c4) —
    small exact integers in both engines. Runs as an
    Arrow mapInPandas kernel (the shingle_rows precedent): the
    rolling scan is one linear pass per document, where the
    equivalent Column expression (a per-position substring inside a
    filter lambda) re-traverses the string per position — O(n²) per
    document and interpreted, measured 40x slower at sf0.1. Map-only
    either way: no shuffle."""
    import pandas as pd_
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from data_ingest_spark.functions.partitioning import spread

    mod = mask + 1
    out_schema = StructType([
        df.schema[id_col],
        StructField("n_chunks", LongType()),
        StructField("len_chars", LongType()),
        StructField("avg_chunk_len", DoubleType()),
        StructField("max_chunk_len", LongType()),
        StructField("boundary_hash", LongType()),
    ])

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def one(t: str):
        n = len(t)
        cuts = []
        if n >= window:
            cps = [ord(ch) for ch in t]
            last = 0
            for i in range(window, n + 1):
                h = 0
                for j in range(i - window, i):
                    h = h * 31 + cps[j]
                h %= mod
                if h == 0 and i - last >= min_chunk:
                    cuts.append(i)
                    last = i
        full = [0] + cuts
        if (cuts[-1] if cuts else 0) < n or n == 0:
            full.append(n)
        lens = [full[j] - full[j - 1] for j in range(1, len(full))]
        bh = 0
        for c in cuts:
            bh = (bh * 1000003 + c) % 2147483647
        avg = round(n / len(lens), 9) if lens else 0.0
        return (len(lens), n, avg, max(lens) if lens else 0, bh)

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("nc", "lc", "av", "mx", "bh")}
            for t in pdf[text_col]:
                nc, lc, av, mx, bh = one(t)
                rows["nc"].append(nc)
                rows["lc"].append(lc)
                rows["av"].append(av)
                rows["mx"].append(mx)
                rows["bh"].append(bh)
            yield pd_.DataFrame({
                id_col: pdf[id_col],
                "n_chunks": pd_.Series(rows["nc"], dtype="int64"),
                "len_chars": pd_.Series(rows["lc"], dtype="int64"),
                "avg_chunk_len": pd_.Series(rows["av"], dtype="float64"),
                "max_chunk_len": pd_.Series(rows["mx"], dtype="int64"),
                "boundary_hash": pd_.Series(rows["bh"], dtype="int64"),
            })

    return spread(df.select(id_col, text_col)).mapInPandas(gen, out_schema)


def decontam_spans(corpus: DataFrame, benchmark: DataFrame, k: int = 13,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Span-level decontamination (the GPT-3/PaLM appendix method):
    for each corpus document, locate every TOKEN POSITION where a
    ``k``-gram also appears in the benchmark set — not just whether
    the document is contaminated (x34) but WHERE, so the pipeline can
    excise the spans and keep the rest of the document. Returns
    ``(doc_id, n_positions, n_hits, first_hit_pos, longest_run)`` for
    contaminated documents: longest_run is the longest streak of
    consecutive matching positions (adjacent hits merge into one span
    of length run+k-1 tokens).

    Plan: benchmark k-grams collapse to DISTINCT then BROADCAST (test
    sets are tiny; the corpus side explodes scan-side) — one left
    broadcast join against the exploded (doc, pos, gram) frame, then
    ONE groupBy(doc). The longest-run statistic folds over the sorted
    hit-position list (bounded by hits per doc), never a window."""
    from data_ingest_spark.extensions.text import tokens_col
    def grams(c):
        toks = tokens_col(c)
        idx = F.sequence(F.lit(0), F.size(toks) - k)
        win = F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.get(toks, i + j) for j in range(k)]))
        return F.when(F.size(toks) >= k, win).otherwise(
            F.array().cast("array<string>"))
    bench = (benchmark.select(F.explode(grams(text_col)).alias("_g"))
             .distinct().withColumn("_hit", F.lit(1)))
    pos = (corpus.select(
        id_col, F.posexplode(grams(text_col)).alias("_p", "_g")))
    marked = pos.join(F.broadcast(bench), "_g", "left")
    hits = F.sort_array(F.collect_list(
        F.when(F.col("_hit").isNotNull(), F.col("_p"))))
    agg = marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_positions"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long")
        .alias("n_hits"),
        hits.alias("_hp"))
    run = F.aggregate(
        F.col("_hp"),
        F.struct(F.lit(0).cast("int").alias("best"),
                 F.lit(0).cast("int").alias("cur"),
                 F.lit(-2).cast("int").alias("prev")),
        lambda acc, p: F.struct(
            F.greatest(acc["best"],
                       F.when(p == acc["prev"] + 1, acc["cur"] + 1)
                       .otherwise(F.lit(1))).alias("best"),
            F.when(p == acc["prev"] + 1, acc["cur"] + 1)
            .otherwise(F.lit(1)).alias("cur"),
            p.alias("prev")),
        lambda acc: acc["best"])
    return (agg.filter(F.col("n_hits") > 0)
            .select(id_col, "n_positions", "n_hits",
                    F.element_at("_hp", 1).cast("long")
                    .alias("first_hit_pos"),
                    run.cast("long").alias("longest_run")))


def good_turing_spectrum(df: DataFrame, text_col: str = "text",
                         max_r: int = 10, k: int = 3) -> DataFrame:
    """Good–Turing frequency-of-frequencies spectrum over the corpus's
    word ``k``-shingle types: for each type count r ≤ ``max_r``, the
    number of types seen exactly r times (n_r), the Turing-smoothed
    adjusted count r* = (r+1)·n_{r+1}/n_r, and the total probability
    mass the r-class carries (r·n_r/N). r=1's mass is the Good–Turing
    estimate of UNSEEN type mass — the standard answer to "how much of
    this corpus's distribution has my tokenizer/LM not seen yet",
    which sizes vocab growth before a training run. Shingle types
    (not unigrams) are the unit because the low-r tail is where the
    estimator lives — unigram vocabularies saturate.

    Two corpus-wide aggregations (shingle counts, then
    count-of-counts); the spectrum itself is ≤ max_r rows, so the
    final stage is bounded state regardless of corpus size. All
    counts are exact int64; the two ratios round 6dp.

    Returns ``(r, n_r, r_star, mass)``.
    """
    uni = (df.select(F.explode(shingles_col(text_col, k)).alias("w"))
           .groupBy("w").agg(F.count("*").alias("cw")))
    spec = (uni.groupBy(F.col("cw").alias("r"))
            .agg(F.count("*").alias("n_r"))
            .filter(F.col("r") <= max_r + 1))
    tot = uni.agg(F.sum("cw").cast("double").alias("_n"))
    nxt = spec.select((F.col("r") - 1).alias("r"),
                      F.col("n_r").alias("_n_next"))
    return (spec.filter(F.col("r") <= max_r)
            .join(nxt, "r", "left")
            .crossJoin(F.broadcast(tot))
            .select(F.col("r").cast("long").alias("r"),
                    F.col("n_r").cast("long").alias("n_r"),
                    F.round((F.col("r") + 1).cast("double")
                            * F.col("_n_next").cast("double")
                            / F.col("n_r").cast("double"), 6)
                    .alias("r_star"),
                    F.round(F.col("r").cast("double")
                            * F.col("n_r").cast("double") / F.col("_n"), 6)
                    .alias("mass")))


def zipf_fit(df: DataFrame, text_col: str = "text",
             group_col: str = "source", top_k: int = 100) -> DataFrame:
    """Per-group Zipf law fit: rank the group's top-``top_k`` tokens
    by frequency (count desc, token asc — the explicit tie-break) and
    OLS-fit ln(count) ~ ln(rank). The slope is the Zipf exponent (−1
    for natural text; far from it for boilerplate or synthetic spam),
    a one-number distribution fingerprint used to compare sources and
    catch template-heavy ones before they skew a training mix.

    One token-count aggregation, a per-group top-k window (partitioned
    by group), then the closed-form OLS from the five classical sums —
    the same construction as operators/regression.ols_band, grouped.
    Returns ``(group, n_ranked, zipf_slope, zipf_intercept)``, floats
    rounded 6dp.
    """
    from pyspark.sql import Window as W
    uni = (df.select(F.col(group_col).alias("g"),
                     F.explode(tokens_col(text_col)).alias("w"))
           .groupBy("g", "w").agg(F.count("*").alias("cw")))
    win = W.partitionBy("g").orderBy(F.desc("cw"), F.asc("w"))
    ranked = (uni.withColumn("_rk", F.row_number().over(win))
              .filter(F.col("_rk") <= top_k))
    pts = ranked.select(
        "g", F.log(F.col("_rk").cast("double")).alias("x"),
        F.log(F.col("cw").cast("double")).alias("y"))
    fit = pts.groupBy("g").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return fit.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_ranked"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("zipf_intercept"))


def kneser_ney_bigrams(df: DataFrame, discount: float = 0.75,
                       top_k: int = 100,
                       text_col: str = "text") -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities — the standard
    smoothed n-gram LM (Kneser & Ney 1995; Chen & Goodman 1999's
    benchmark winner): P(w2|w1) = max(c−d,0)/c(w1·) + λ(w1)·Pcont(w2),
    with the continuation probability Pcont(w2) = |{w1 : c(w1,w2)>0}|
    / |bigram types| — "how many contexts has w2 completed", not "how
    often", which is what makes KN beat add-k on unseen continuations.
    The smoothed LM scores candidate text for perplexity filtering
    (x74) with far better tail behavior than the raw MLE of x47.

    Everything derives from one bigram-count aggregation: context
    totals and right-branching counts group by w1, continuation
    counts by w2, the type total is one scalar — all exact int64; the
    final probability is a fixed-order double expression mirrored by
    the oracle. Returns the ``top_k`` bigrams by count (ties: w1, w2)
    as ``(w1, w2, pair_count, p_kn)``.
    """
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bg = (df.filter(F.size(toks) >= 2)
          .select(F.explode(F.transform(
              idx, lambda i: F.struct(
                  F.get(toks, i - 1).alias("w1"),
                  F.get(toks, i).alias("w2")))).alias("p"))
          .select("p.w1", "p.w2"))
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = counts.groupBy("w1").agg(
        F.sum("c").alias("_cw1"), F.count("*").alias("_nr"))
    cont = counts.groupBy("w2").agg(F.count("*").alias("_nl"))
    tot = counts.agg(F.count("*").cast("double").alias("_t"))
    d = F.lit(discount)
    scored = (counts.join(ctx, "w1").join(cont, "w2")
              .crossJoin(F.broadcast(tot)))
    p_kn = ((F.col("c").cast("double") - d)
            / F.col("_cw1").cast("double")
            + (d * F.col("_nr").cast("double")
               / F.col("_cw1").cast("double"))
            * (F.col("_nl").cast("double") / F.col("_t")))
    # orderBy + limit plans a distributed TakeOrderedAndProject (the
    # x103/x31 pattern) — never a single-partition rank window.
    return (scored.select("w1", "w2",
                          F.col("c").cast("long").alias("pair_count"),
                          F.round(p_kn, 6).alias("p_kn"))
            .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
            .limit(top_k))


def log_odds_terms(df: DataFrame, group_col: str = "source",
                   text_col: str = "text", top_k: int = 10) -> DataFrame:
    """Per-group discriminative terms by smoothed log-odds-ratio
    z-score (the "Fightin' Words" construction, Monroe et al. 2008,
    with a Haldane 0.5 prior): for each (group, token), the log odds
    of the token inside the group vs the rest of the corpus, divided
    by its approximate standard error 1/(c_in+0.5) + 1/(c_out+0.5).
    Unlike raw TF-IDF this is variance-aware — a token seen 3:0 does
    not outrank one seen 300:10 — which is what makes it the standard
    "what is characteristic of THIS source" report before deciding
    mixing weights or exclusion rules.

    One (group, token) count, group totals broadcast, one token-keyed
    join against the global counts; the z expression is a pinned-order
    double formula over exact integers. Returns the ``top_k`` rows per
    group by z desc (ties: token asc) as
    ``(group, token, c_in, c_out, z)``.
    """
    uni = (df.select(F.col(group_col).alias("g"),
                     F.explode(tokens_col(text_col)).alias("w"))
           .groupBy("g", "w").agg(F.count("*").alias("_c")))
    ng = uni.groupBy("g").agg(F.sum("_c").alias("_ng"))
    cw = uni.groupBy("w").agg(F.sum("_c").alias("_cw"))
    n = uni.agg(F.sum("_c").cast("double").alias("_n"))
    j = (uni.join(F.broadcast(ng), "g").join(cw, "w")
         .crossJoin(F.broadcast(n)))
    c_in = F.col("_c").cast("double")
    c_out = (F.col("_cw") - F.col("_c")).cast("double")
    n_in = F.col("_ng").cast("double")
    n_out = F.col("_n") - F.col("_ng").cast("double")
    delta = (F.log((c_in + 0.5) / (n_in - c_in + 0.5))
             - F.log((c_out + 0.5) / (n_out - c_out + 0.5)))
    z = delta / F.sqrt(1.0 / (c_in + 0.5) + 1.0 / (c_out + 0.5))
    win = W.partitionBy("g").orderBy(F.desc("_z"), F.asc("w"))
    scored = j.select("g", "w",
                      F.col("_c").cast("long").alias("c_in"),
                      (F.col("_cw") - F.col("_c")).cast("long")
                      .alias("c_out"),
                      F.round(z, 6).alias("_z"))
    return (scored.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= top_k)
            .select(F.col("g").alias(group_col),
                    F.col("w").alias("token"), "c_in", "c_out",
                    F.col("_z").alias("z")))


def charset_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-health screen per document: non-ASCII character
    ratio, control-character count (below 0x20, excluding tab/LF/CR),
    and U+FFFD replacement-character count — the three standard
    mojibake/transcoding-damage signals a crawl pipeline gates on
    before any language-level processing. Pure Column expressions
    (map-only, zero shuffle).

    Returns ``(doc_id, n_chars, n_non_ascii, non_ascii_ratio,
    n_control, n_replacement, charset_ok)`` — ok means no control or
    replacement characters and non-ASCII below 30%.
    """
    nc = F.length(F.col(text_col))
    non_ascii = F.length(
        F.regexp_replace(F.col(text_col), r"[\x00-\x7F]", ""))
    ctrl = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col),
                         "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))
    repl = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "�", ""))
    ratio = F.round(non_ascii / nc, 6)
    return df.select(
        "doc_id", nc.cast("long").alias("n_chars"),
        non_ascii.cast("long").alias("n_non_ascii"),
        ratio.alias("non_ascii_ratio"),
        ctrl.cast("long").alias("n_control"),
        repl.cast("long").alias("n_replacement"),
        ((ctrl == 0) & (repl == 0) & (ratio < 0.3)).alias("charset_ok"))


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   pcts: tuple = (50, 75, 90, 95, 99)) -> DataFrame:
    """Vocabulary coverage curve: the number of vocabulary entries
    (most-frequent-first) needed to cover each target percentage of
    corpus tokens — THE sizing curve for a tokenizer vocab or an
    embedding table (the gap between p90 and p99 is where vocab cost
    explodes). Returns ``(pct, vocab_needed, tokens_covered)``.

    Scalable global rank without a single-task sort: the order is
    (count desc, token asc), so the COUNT VALUE is its own coarse
    bucket — per-count totals collect to a bounded prefix-sum table
    (distinct count values, not vocabulary size), tokens rank within
    their count bucket in parallel, and within a bucket every entry
    adds the same mass, so the cumulative mass is offset + local_rank
    × count. Exact integers end to end.
    """
    uni = (df.select(F.explode(tokens_col(text_col)).alias("w"))
           .groupBy("w").agg(F.count("*").alias("_c")))
    per_n = (uni.groupBy("_c").agg(F.count("*").alias("_types"))
             .orderBy(F.desc("_c")).collect())
    if not per_n:
        return df.sparkSession.createDataFrame(
            [], "pct long, vocab_needed long, tokens_covered long")
    rank_off, mass_off, r_acc, m_acc = {}, {}, 0, 0
    total = 0
    for row in per_n:
        rank_off[row["_c"]] = r_acc
        mass_off[row["_c"]] = m_acc
        r_acc += row["_types"]
        m_acc += row["_types"] * row["_c"]
    total = m_acc
    rmap = F.create_map(*[F.lit(x) for kv in rank_off.items() for x in kv])
    mmap = F.create_map(*[F.lit(x) for kv in mass_off.items() for x in kv])
    wb = W.partitionBy("_c").orderBy("w")
    ranked = (uni.withColumn("_lr", F.row_number().over(wb))
              .select((rmap[F.col("_c")] + F.col("_lr")).alias("_rank"),
                      (mmap[F.col("_c")] + F.col("_lr") * F.col("_c"))
                      .alias("_mass")))
    from data_ingest_spark.functions.localrel import arrow_local_df
    targets = arrow_local_df(
        df.sparkSession,
        [(int(p), (total * int(p) + 99) // 100) for p in pcts],
        "pct long, _need long", ["pct", "_need"])
    return (ranked.join(F.broadcast(targets),
                        F.col("_mass") >= F.col("_need"))
            .groupBy("pct")
            .agg(F.min("_rank").cast("long").alias("vocab_needed"),
                 F.min("_mass").cast("long").alias("tokens_covered")))


def feature_hash(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n_dims: int = 1024) -> DataFrame:
    """Hashing-trick featurizer (Weinberger 2009): every token maps
    to ``dim = md5(token) mod n_dims`` with a ±1 sign drawn from an
    independent hash bit, and a document's feature value is the
    signed token-count sum — the fixed-width, vocabulary-free
    vectorizer that feeds linear/logistic baselines and dedup
    sketches at corpus scale (no vocab build, no OOV, merge = add).
    The sign bit keeps collisions unbiased (E[collision noise] = 0).

    md5 is the hash in BOTH engines, so the exact (id, dim, weight)
    long form is value-checkable. One token-count aggregation keyed
    by (id, dim) — a single corpus shuffle; output rows are bounded
    by min(tokens, n_dims) per document. Zero-sum features drop (a
    +1/-1 collision cancels — mirrored in the oracle).

    Returns ``(id, dim, weight)``.
    """
    w = F.explode(tokens_col(text_col)).alias("w")
    h = F.md5(F.col("w").cast("binary"))
    dim = (F.conv(F.substring(h, 1, 7), 16, 10).cast("long")
           % n_dims).alias("dim")
    sign = (F.conv(F.substring(h, 8, 1), 16, 10).cast("long") % 2 * 2
            - 1).alias("_sgn")
    return (df.select(F.col(id_col), w)
            .select(id_col, dim, sign)
            .groupBy(id_col, "dim")
            .agg(F.sum("_sgn").cast("long").alias("weight"))
            .filter(F.col("weight") != 0))


def winnowing_fingerprints(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 8,
                           window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03): hash every character ``k``-gram, then keep the minimum
    hash of every sliding window of ``window`` consecutive positions.
    Guarantees every exact match of length ≥ k + window − 1 shares a
    fingerprint, with expected density 2/(window+1) — the standard
    plagiarism / near-dup fingerprint, robust to insertions that
    shift positions (unlike fixed-stride sampling).

    Returns distinct (id, fp) rows; feed to dedup.fingerprint_pairs.

    Determinism & cross-engine: the gram hash is the first 12 hex
    digits of md5 (48 bits — collision-free in practice) parsed as
    int64; the window minimum is VALUE-distinct, so both engines select
    the identical fingerprint set with no tie-break sensitivity.

    Plan shape: one DOC-level hash repartition by id (explicit
    partition count, so AQE cannot coalesce the tiny doc frame back
    to one task), then the gram explode + md5 run ON the repartition
    output — full-parallel and already hash-clustered by id, so the
    window and the distinct both reuse the partitioning with no
    further exchange. Shuffling docs instead of grams moves ~L bytes
    per document through the wire instead of ~24·L gram rows (a 24×
    exchange reduction at any scale); before this, the explode+hash
    ran on the raw scan's partitions (documents.parquet is ONE small
    file locally — 2 tasks hashed every gram while 30 cores idled).
    Documents shorter than k + window − 1 are dropped (both engines).

    A shuffle-free variant (per-row array HOFs: transform + slice +
    array_min over the in-row hash array) was measured and REJECTED:
    naively it O(L²)-recomputes the md5 array per position under
    project-collapse, and even lambda-bound it runs 13.6 s vs 5.2 s
    at sf0.1 — Spark evaluates higher-order array functions
    interpreted, while this window form stays in codegen; its one
    gram shuffle is linear (32 MB at sf0.1, SCALING.md)."""
    min_len = k + window - 1
    n_part = df.sparkSession.sparkContext.defaultParallelism
    grams = (df.filter(F.length(text_col) >= min_len)
             .repartition(n_part, F.col(id_col))
             .select(F.col(id_col), F.posexplode(F.expr(
                 f"transform(sequence(1, length({text_col}) - {k - 1}), "
                 f"i -> substring({text_col}, i, {k}))"))
                 .alias("_pos0", "_g")))
    h = F.conv(F.substring(F.md5(F.col("_g").cast("binary")), 1, 12),
               16, 10).cast("long")
    wmin = (W.partitionBy(id_col).orderBy("_pos0")
            .rowsBetween(-(window - 1), 0))
    return (grams.withColumn("_h", h)
            .withColumn("_mn", F.min("_h").over(wmin))
            .filter(F.col("_pos0") >= window - 1)
            .select(F.col(id_col), F.col("_mn").alias("fp"))
            .distinct())


def token_fertility(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    len_col: str = "n_chars") -> DataFrame:
    """Per-document tokenizer-fertility metrics: whitespace token
    count and characters per token (the compression a tokenizer must
    beat; by-language fertility gaps are how multilingual corpora get
    token budgets wrong). Map-only — aggregate by language/length
    bucket downstream."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    return df.withColumn("n_tokens", n_tok.cast("long")).withColumn(
        "chars_per_token",
        F.round(F.col(len_col).cast("double") / F.col("n_tokens"), 6))


def term_dispersion(df: DataFrame, group_col: str = "source",
                    text_col: str = "text", top_k: int = 50,
                    min_count: int = 20) -> DataFrame:
    """Gries' deviation-of-proportions (DP) term dispersion: how
    unevenly a term's occurrences spread across corpus parts
    (sources). DP = ½·Σ_parts |v_i − s_i| with v_i the term's share of
    its occurrences in part i and s_i the part's share of all tokens;
    0 = perfectly even, →1 = confined to one tiny part. The corpus-
    linguistics complement to log-odds (x132): log-odds finds terms
    that DISTINGUISH one part, DP finds terms that are UNRELIABLE
    corpus-wide (burst in one crawl slice — navigation junk,
    templates).

    Parts with zero occurrences still contribute s_i, folded in
    closed form: Σ|v−s| = 1 + Σ_{parts with c>0} (|v−s| − s), so the
    aggregate never needs a dense term×part frame. Ranking uses the
    ROUNDED dp (6dp) with the term as tie-break — deterministic
    cross-engine. Bounded shuffles: token counts by (part, term),
    part sizes, one final top-k window."""
    tok = df.select(F.col(group_col).alias("_part"),
                    F.explode(tokens_col(text_col)).alias("_t"))
    cst = tok.groupBy("_part", "_t").agg(F.count("*").alias("_c"))
    part_sz = tok.groupBy("_part").agg(F.count("*").alias("_ps"))
    total = part_sz.agg(F.sum("_ps").alias("_tot"))
    ct = cst.groupBy("_t").agg(F.sum("_c").alias("_ct"))
    j = (cst.join(ct, "_t").filter(F.col("_ct") >= min_count)
         .join(part_sz, "_part").crossJoin(F.broadcast(total)))
    v = F.col("_c").cast("double") / F.col("_ct")
    s = F.col("_ps").cast("double") / F.col("_tot")
    dp = (F.lit(1.0) + F.sum(F.abs(v - s) - s)) / F.lit(2.0)
    scored = (j.groupBy("_t", "_ct")
              .agg(F.round(dp, 6).alias("dp")))
    # global top-k via TakeOrderedAndProject (orderBy+limit), not an
    # unpartitioned row_number window — no single-partition WindowExec
    return (scored.orderBy(F.col("dp").desc(), F.col("_t").asc())
            .limit(top_k)
            .select(F.col("_t").alias("term"),
                    F.col("_ct").cast("long").alias("n_occurrences"),
                    "dp"))
