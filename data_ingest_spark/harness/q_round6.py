"""Round-6 additions: record linkage (Fellegi–Sunter, sorted
neighborhood), LSH precision audit, winnowing fingerprints, timing
regularity (bot detection), tokenizer fertility, corpus-concentration
Gini, and Jensen–Shannon token drift.

Registered AFTER the round-6 driver-verification backlog (the
_ROUND6_PRIORITY prefix in registry.py) — these never displace the
never-sampled queries from the driver's 50-slot sample (round-5
verdict ask #1).

The shared ``_q`` decorator writes into registry.REGISTRY at import
time.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingest_spark.extensions import dedup as dd
from data_ingest_spark.extensions import profile as pf
from data_ingest_spark.extensions import text as tx
from data_ingest_spark.harness.q_extensions import (_DUP_SQL, _NEARDUP_SQL,
                                                    _MINHASH_FOUND_CTES,
                                                    _dup_corpus,
                                                    _neardup_corpus,
                                                    _shingle_ctes)
from data_ingest_spark.harness.registry import _q, events_df, load

# ------------------------------------------------------ record linkage

#: Fellegi–Sunter m/u probabilities for the three customer comparison
#: features (mktsegment equality, acctbal within 50, custkey within
#: 100). Fixed inputs — the EM estimation step is out of scope; the
#: ln-weights are PRECOMPUTED here and embedded as double literals in
#: BOTH engines, so the checked expression contains no runtime libm.
_FS_M = [0.95, 0.8, 0.6]
_FS_U = [0.2, 0.05, 0.01]
_FS_WA = [round(math.log(m / u), 9) for m, u in zip(_FS_M, _FS_U)]
_FS_WD = [round(math.log((1 - m) / (1 - u)), 9)
          for m, u in zip(_FS_M, _FS_U)]


@_q("x141_fellegi_sunter", f"""
WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
                  CAST(FLOOR(c_acctbal / 500) AS INTEGER) AS blk
           FROM customer),
 pr AS (SELECT a.c_nationkey,
               (a.c_mktsegment = b.c_mktsegment) AS f_seg,
               (ABS(a.c_acctbal - b.c_acctbal) < 50.0) AS f_bal,
               (ABS(a.c_custkey - b.c_custkey) < 100) AS f_key
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
         AND a.c_custkey < b.c_custkey),
 sc AS (SELECT c_nationkey,
               ROUND((CASE WHEN f_seg THEN {_FS_WA[0]}
                           ELSE {_FS_WD[0]} END)
                   + (CASE WHEN f_bal THEN {_FS_WA[1]}
                           ELSE {_FS_WD[1]} END)
                   + (CASE WHEN f_key THEN {_FS_WA[2]}
                           ELSE {_FS_WD[2]} END), 6) AS weight
        FROM pr),
 dec AS (SELECT c_nationkey, weight,
                CASE WHEN weight >= 3.0 THEN 'match'
                     WHEN weight >= 0.0 THEN 'possible'
                     ELSE 'nonmatch' END AS decision
         FROM sc)
SELECT c_nationkey, decision, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(weight), 6) AS avg_weight
FROM dec GROUP BY 1, 2
""")
def q_fellegi_sunter(spark, sf):
    """Probabilistic record linkage over blocked customer pairs:
    block on (nation, acctbal/500 bucket), compare three features,
    score with precomputed Fellegi–Sunter ln-weights, classify, and
    summarize per (nation, decision). Pair count is Σ|block|² — never
    all-pairs (dedup.blocked_pairs docstring)."""
    cust = load(spark, sf, "customer").withColumn(
        "_blk", F.floor(F.col("c_acctbal") / 500).cast("int"))
    pairs = dd.blocked_pairs(cust, ["c_nationkey", "_blk"],
                             id_col="c_custkey")
    feats = (pairs
             .withColumn("f_seg", F.col("c_mktsegment_a")
                         == F.col("c_mktsegment_b"))
             .withColumn("f_bal", F.abs(F.col("c_acctbal_a")
                                        - F.col("c_acctbal_b")) < 50.0)
             .withColumn("f_key", F.abs(F.col("c_custkey_a")
                                        - F.col("c_custkey_b")) < 100))
    scored = dd.fellegi_sunter_score(feats, ["f_seg", "f_bal", "f_key"],
                                     m=_FS_M, u=_FS_U)
    return scored.groupBy("c_nationkey", "decision").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("weight"), 6).alias("avg_weight"))


@_q("x143_sorted_neighborhood", f"""
WITH corpus AS ({_DUP_SQL}),
 r AS (SELECT doc_id, text,
              ROW_NUMBER() OVER (ORDER BY lower(substr(text, 1, 30)),
                                 doc_id) AS rn
       FROM corpus),
 pr AS (SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
               GREATEST(a.doc_id, b.doc_id) AS id_b,
               levenshtein(substr(a.text, 1, 60),
                           substr(b.text, 1, 60)) AS lev
        FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3)
SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev
FROM pr WHERE lev <= 20
""")
def q_sorted_neighborhood(spark, sf):
    """Sorted-neighborhood dedup: sort by a 30-char lowercased prefix
    key, compare only records within a 3-position sliding window
    (pair count = 3n), verify with Levenshtein on the 60-char head.
    Global order via the W5 two-pass dense rank — no single-task sort
    (dedup.sorted_neighborhood_pairs docstring)."""
    pairs = dd.sorted_neighborhood_pairs(
        _dup_corpus(spark, sf),
        F.lower(F.substring(F.col("text"), 1, 30)), window=3)
    return (pairs.select(
        F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b"),
        F.levenshtein(F.substring(F.col("text_a"), 1, 60),
                      F.substring(F.col("text_b"), 1, 60))
        .cast("long").alias("lev"))
        .filter(F.col("lev") <= 20))


# --------------------------------------------- dedup audits / winnowing

@_q("x142_lsh_precision", f"""
WITH corpus AS ({_NEARDUP_SQL}),{_shingle_ctes('corpus')},{_MINHASH_FOUND_CTES}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_verified,
       ROUND((SELECT COUNT(*) FROM found) * 1.0
             / (SELECT COUNT(*) FROM cand), 6) AS precision_at_t
""")
def q_lsh_precision(spark, sf):
    """Precision of the MinHash-LSH banding filter: what fraction of
    band-bucket candidate pairs verify at Jaccard ≥ 0.5. The
    complement of x57's recall audit — together they bound the
    filter's operating point, each under a full value oracle."""
    # lazy localCheckpoint, not persist: the membership subtree feeds
    # four consumers (bands, sizes, both verify sides) — checkpointed
    # it is ONE scan in the static plan too, and it is GC-reclaimable
    # (the ppjoin pattern)
    membership = dd.shingle_sets(_neardup_corpus(spark, sf)) \
        .localCheckpoint(eager=False)
    bb = dd.minhash_bands(membership, membership=True)
    cand = dd.lsh_candidate_pairs(bb)
    verified = dd.jaccard_of_pairs(cand, membership).filter(
        F.col("jaccard") >= 0.5)
    return (cand.agg(F.count("*").alias("n_candidates"))
            .crossJoin(verified.agg(F.count("*").alias("n_verified")))
            .select("n_candidates", "n_verified",
                    F.round(F.col("n_verified") / F.col("n_candidates"), 6)
                    .alias("precision_at_t")))


@_q("x148_winnowing", f"""
WITH corpus AS ({_NEARDUP_SQL}),
 pos AS (SELECT doc_id, text,
                unnest(generate_series(1, length(text) - 7)) AS p
         FROM corpus WHERE length(text) >= 11),
 h AS (SELECT doc_id, p,
              CAST(concat('0x', substr(md5(substr(text, p, 8)), 1, 12))
                   AS BIGINT) AS hv
       FROM pos),
 mn AS (SELECT doc_id, p,
               MIN(hv) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                 AS fp
        FROM h),
 fps AS (SELECT DISTINCT doc_id, fp FROM mn WHERE p >= 4),
 grp AS (SELECT fp FROM fps
         GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 50),
 pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        JOIN grp g ON g.fp = a.fp)
SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 10
""")
def q_winnowing(spark, sf):
    """Winnowing near-dup pairs: per-doc SIGMOD'03 fingerprints
    (8-char grams, window 4), then pairs sharing ≥ 10 fingerprints
    through the df-capped posting lists (≤ 50 docs per fingerprint).
    Position-shift-robust — catches the head-truncated copies that
    break fixed-stride sampling."""
    fps = tx.winnowing_fingerprints(_neardup_corpus(spark, sf))
    return dd.fingerprint_pairs(fps, min_shared=10, max_df=50)


# --------------------------------------------------- profiling / drift

@_q("x144_bot_regularity", """
WITH g AS (SELECT user_id, event_id,
                  epoch_us(ts::TIMESTAMP)
                  - lag(epoch_us(ts::TIMESTAMP))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS gap
           FROM events),
 a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
              SUM(CAST(gap AS DECIMAL(38,0))) AS s,
              SUM(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS DECIMAL(38,0)))
                AS ss
       FROM g WHERE gap IS NOT NULL GROUP BY 1)
SELECT user_id, n_gaps,
       CAST((2 * CAST(s AS BIGINT) + n_gaps) // (2 * n_gaps) AS DOUBLE)
         / 1000000.0 AS mean_gap_s,
       ROUND(SQRT(CAST(n_gaps * ss - s * s AS DOUBLE)
                  / (n_gaps * (n_gaps - 1)))
             / (CAST(s AS DOUBLE) / n_gaps), 6) AS cv_gap,
       (SQRT(CAST(n_gaps * ss - s * s AS DOUBLE)
             / (n_gaps * (n_gaps - 1)))
        / (CAST(s AS DOUBLE) / n_gaps) < 0.5) AS is_regular
FROM a WHERE n_gaps >= 7 AND s > 0
""")
def q_bot_regularity(spark, sf):
    """Inter-event timing regularity per user (bot detection): cv of
    exact-µs gaps from decimal moment aggregates — one window + one
    shuffle on the user key (profile.gap_regularity docstring)."""
    return pf.gap_regularity(events_df(spark, sf))


@_q("x146_gini_source", """
WITH r AS (SELECT source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS rk
           FROM documents)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(2 * SUM(rk * n_chars) - (COUNT(*) + 1) * SUM(n_chars)
                  AS DOUBLE)
             / CAST(COUNT(*) * SUM(n_chars) AS DOUBLE), 6) AS gini
FROM r GROUP BY 1
""")
def q_gini_source(spark, sf):
    """Per-source Gini concentration of character mass — the
    corpus-balance audit (profile.gini_by_group). Exact int64 rank
    formula, tie-stable by construction."""
    return pf.gini_by_group(load(spark, sf, "documents"),
                            "source", "n_chars", "doc_id")


@_q("x147_js_divergence", """
WITH ta AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
            FROM documents WHERE doc_id % 2 = 0),
 tb AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
        FROM documents WHERE doc_id % 2 = 1),
 ca AS (SELECT CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT) % 64
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS ca FROM ta GROUP BY 1),
 cb AS (SELECT CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT) % 64
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cb FROM tb GROUP BY 1),
 j AS (SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
              COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
       FROM ca FULL JOIN cb ON ca.bucket = cb.bucket),
 t AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb FROM j)
SELECT CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buckets_a,
       CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buckets_b,
       ROUND(SUM(CASE WHEN ca > 0
                      THEN (CAST(ca AS DOUBLE) / ta)
                           * LN((CAST(ca AS DOUBLE) / ta)
                                / ((CAST(ca AS DOUBLE) / ta
                                    + CAST(cb AS DOUBLE) / tb) / 2.0))
                      ELSE 0.0 END
               + CASE WHEN cb > 0
                      THEN (CAST(cb AS DOUBLE) / tb)
                           * LN((CAST(cb AS DOUBLE) / tb)
                                / ((CAST(ca AS DOUBLE) / ta
                                    + CAST(cb AS DOUBLE) / tb) / 2.0))
                      ELSE 0.0 END) / 2.0, 6) AS jsd
FROM j, t
""")
def q_js_divergence(spark, sf):
    """Jensen–Shannon divergence between the hashed-token
    distributions of the even- and odd-id document halves
    (profile.js_divergence) — bounded-state drift metric, 64 fixed
    buckets at any corpus size."""
    docs = load(spark, sf, "documents")
    return pf.js_divergence(docs.filter(F.col("doc_id") % 2 == 0),
                            docs.filter(F.col("doc_id") % 2 == 1))


@_q("x145_token_fertility", """
WITH f AS (SELECT lang,
                  LEAST(9, n_chars // 100) AS bucket,
                  len(string_split_regex(text, '\\s+')) AS n_tokens,
                  ROUND(CAST(n_chars AS DOUBLE)
                        / len(string_split_regex(text, '\\s+')), 6)
                    AS cpt
           FROM documents)
SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       ROUND(AVG(cpt), 6) AS avg_chars_per_token
FROM f GROUP BY 1, 2
""")
def q_token_fertility(spark, sf):
    """Tokenizer fertility by (language, length bucket): whitespace
    token counts and characters-per-token — the by-language
    compression profile a token-budgeted corpus mix needs
    (text.token_fertility)."""
    fert = tx.token_fertility(load(spark, sf, "documents"))
    return (fert.withColumn(
        "bucket", F.least(F.lit(9), F.floor(F.col("n_chars") / 100))
        .cast("long"))
        .groupBy("lang", "bucket")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("sum_tokens"),
             F.round(F.avg("chars_per_token"), 6)
             .alias("avg_chars_per_token")))


# ------------------------------------------- round-6 batch 2: ranking
# agreement, corpus-linguistics dispersion, quality gate, concurrency

from data_ingest_spark.extensions import curate as cu  # noqa: E402
from data_ingest_spark.extensions import evaluation as ev6  # noqa: E402

#: RBO suffix weights (k=10, p=0.9) — literals shared by both engines.
_RBO_W = ev6.rbo_suffix_weights(10, 0.9)
_RBO_LIT = "[" + ", ".join(repr(w) for w in _RBO_W) + "]"


@_q("x149_rbo", f"""
WITH r AS (SELECT user_id, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY value DESC, event_id ASC)
                    AS ra,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id ASC)
                    AS rb
           FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_common,
       ROUND(SUM(({_RBO_LIT})[GREATEST(ra, rb)]), 6) AS rbo
FROM r WHERE ra <= 10 AND rb <= 10
GROUP BY 1
""")
def q_rbo(spark, sf):
    """Truncated rank-biased overlap between each user's
    by-engagement and by-recency top-10 — an item at ranks (ra, rb)
    contributes the literal suffix weight W[max(ra, rb)]
    (evaluation.rbo_overlap docstring), so the score is exact literal
    arithmetic over integer ranks."""
    return ev6.rbo_overlap(events_df(spark, sf))


@_q("x150_kendall_tau", """
WITH e AS (SELECT user_id, event_id, value,
                  epoch_us(ts::TIMESTAMP) AS y FROM events),
 p AS (SELECT a.user_id,
              SIGN(a.value - b.value) AS sx, SIGN(a.y - b.y) AS sy
       FROM e a JOIN e b ON a.user_id = b.user_id
                        AND a.event_id < b.event_id),
 g AS (SELECT user_id, COUNT(*) AS n0,
              CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
              CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS d,
              SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS n1,
              SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS n2
       FROM p GROUP BY 1)
SELECT user_id, c AS concordant, d AS discordant,
       ROUND((c - d) / SQRT(CAST(n0 - n1 AS DOUBLE)
                            * CAST(n0 - n2 AS DOUBLE)), 6) AS tau_b
FROM g WHERE n0 > n1 AND n0 > n2
""")
def q_kendall_tau(spark, sf):
    """Kendall τ-b between a user's engagement values and event times
    (does engagement trend with recency?): exact integer
    concordant/discordant/tie counts from the within-user pair join,
    one sqrt-divide at the end (evaluation.kendall_tau_b)."""
    ev = events_df(spark, sf).withColumn(
        "_y", F.unix_micros(F.col("ts").cast("timestamp")))
    return ev6.kendall_tau_b(ev)


@_q("x151_term_dispersion", """
WITH tok AS (SELECT source AS part,
                    unnest(string_split_regex(lower(text), '\\s+')) AS t
             FROM documents),
 cst AS (SELECT part, t, CAST(COUNT(*) AS BIGINT) AS c
         FROM tok GROUP BY 1, 2),
 ps AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS psz
        FROM tok GROUP BY 1),
 tot AS (SELECT SUM(psz) AS tt FROM ps),
 ct AS (SELECT t, SUM(c) AS ctt FROM cst GROUP BY 1),
 j AS (SELECT cst.t, ct.ctt, cst.c, ps.psz, tot.tt
       FROM cst JOIN ct ON ct.t = cst.t
                JOIN ps ON ps.part = cst.part, tot
       WHERE ct.ctt >= 20),
 sc AS (SELECT t, ctt,
               ROUND((1.0 + SUM(ABS(CAST(c AS DOUBLE) / ctt
                                    - CAST(psz AS DOUBLE) / tt)
                                - CAST(psz AS DOUBLE) / tt)) / 2.0, 6)
                 AS dp
        FROM j GROUP BY 1, 2)
SELECT t AS term, CAST(ctt AS BIGINT) AS n_occurrences, dp
FROM sc ORDER BY dp DESC, t ASC LIMIT 50
""")
def q_term_dispersion(spark, sf):
    """Top-50 most source-skewed terms by Gries' DP dispersion —
    the crawl-slice burst detector (text.term_dispersion docstring:
    zero-occurrence parts folded in closed form, ranking on the
    rounded score)."""
    return tx.term_dispersion(load(spark, sf, "documents"))


@_q("p5_gopher_gate", """
WITH d AS (SELECT doc_id, text, lang, n_chars,
                  string_split_regex(lower(text), '\\s+') AS toks
           FROM documents),
 rules AS (SELECT doc_id,
    (n_chars BETWEEN 50 AND 20000) AS r_len,
    (CAST(n_chars AS DOUBLE) / len(toks) >= 2.0
     AND CAST(n_chars AS DOUBLE) / len(toks) <= 12.0) AS r_wordlen,
    (lang != 'en' OR
     CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
          AS DOUBLE) <= 0.25 * n_chars) AS r_symbol,
    (lang != 'en' OR
     (CAST(list_contains(toks, 'the') AS INT)
      + CAST(list_contains(toks, 'of') AS INT)
      + CAST(list_contains(toks, 'and') AS INT)
      + CAST(list_contains(toks, 'to') AS INT)
      + CAST(list_contains(toks, 'in') AS INT)) >= 2) AS r_stop,
    (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.30)
      AS r_distinct
  FROM d)
SELECT doc_id, r_len, r_wordlen, r_symbol, r_stop, r_distinct,
       (r_len AND r_wordlen AND r_symbol AND r_stop AND r_distinct)
         AS pass
FROM rules
""")
def q_gopher_gate(spark, sf):
    """Gopher-style five-rule quality gate, one map-only scan-side
    pass with per-rule booleans (curate.gopher_gate)."""
    return cu.gopher_gate(load(spark, sf, "documents")).select(
        "doc_id", "r_len", "r_wordlen", "r_symbol", "r_stop",
        "r_distinct", "pass")


@_q("e30_peak_concurrency", """
WITH b AS (
  SELECT event_type, event_id, epoch_us(ts::TIMESTAMP) AS t,
         1 AS delta
  FROM events
  UNION ALL
  SELECT event_type, event_id,
         epoch_us(ts::TIMESTAMP)
         + CAST(ROUND(value * 1000000) AS BIGINT) AS t, -1 AS delta
  FROM events),
 r AS (SELECT event_type, t,
              SUM(delta) OVER (PARTITION BY event_type
                               ORDER BY t, delta, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS c
       FROM b),
 p AS (SELECT event_type, MAX(c) AS peak FROM r GROUP BY 1)
SELECT r.event_type, CAST(p.peak AS BIGINT) AS peak,
       MIN(r.t) AS first_peak_t
FROM r JOIN p ON p.event_type = r.event_type AND r.c = p.peak
GROUP BY 1, 2
""")
def q_peak_concurrency(spark, sf):
    """Maximum simultaneous activity per event type over
    [ts, ts + value s] intervals, +1/−1 boundary sweep in exact
    integer µs, with the first time the peak is reached
    (evaluation.peak_concurrency)."""
    return ev6.peak_concurrency(events_df(spark, sf))


@_q("x152_k_anonymity", """
SELECT c_nationkey, c_mktsegment,
       CAST(FLOOR(c_acctbal / 100) AS INTEGER) AS bal_bucket,
       CAST(COUNT(*) AS BIGINT) AS class_size
FROM customer
GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
""")
def q_k_anonymity(spark, sf):
    """k-anonymity audit (k=5) over the (nation, segment, balance
    bucket) quasi-identifiers: equivalence classes small enough to
    re-identify a customer (profile.k_anonymity)."""
    cust = load(spark, sf, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("int").alias("bal_bucket"))
    return pf.k_anonymity(cust,
                          ["c_nationkey", "c_mktsegment", "bal_bucket"])


@_q("e31_pattern_negation", """
WITH t AS (SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS us FROM events),
 n AS (SELECT user_id, event_type, us,
              MIN(CASE WHEN event_type = 'purchase' THEN us END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                AS ng,
              MIN(CASE WHEN event_type = 'click' THEN us END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                AS nb
       FROM t),
 s AS (SELECT user_id,
              (ng IS NOT NULL AND ng - us <= 604800000000)
                AS conv,
              (ng IS NOT NULL AND ng - us <= 604800000000
               AND (nb IS NULL OR nb >= ng)) AS clean
       FROM n WHERE event_type = 'signup')
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_starts,
       CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conversions,
       CAST(SUM(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clean
FROM s GROUP BY 1
""")
def q_pattern_negation(spark, sf):
    """CEP negation funnel: signups converting to a purchase within 7
    days with NO intervening click (evaluation.pattern_negation) —
    the pattern class ordered-step funnels can't express, in one
    window pass."""
    return ev6.pattern_negation(events_df(spark, sf))


@_q("e32_decay_attribution", """
WITH t AS (SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS us FROM events),
 conv AS (SELECT user_id, event_id AS cid, us AS cus
          FROM t WHERE event_type = 'purchase'),
 touch AS (SELECT user_id, event_id AS tid, event_type AS channel,
                  us AS tus
           FROM t WHERE event_type IN ('click', 'view')),
 pairs AS (SELECT c.cid, tt.channel,
                  CAST(ROUND(EXP(-0.6931471805599453
                              * (CAST(c.cus - tt.tus AS DOUBLE)
                                 / 1000000.0) / 86400.0)
                             * 1000000) AS BIGINT) AS w
           FROM conv c JOIN touch tt
             ON tt.user_id = c.user_id AND tt.tus < c.cus
            AND c.cus - tt.tus <= 604800000000),
 n AS (SELECT cid, SUM(w) AS wsum FROM pairs GROUP BY 1)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(SUM(CAST(p.w AS DOUBLE) / n.wsum), 6) AS total_credit
FROM pairs p JOIN n ON n.cid = p.cid
GROUP BY 1
""")
def q_decay_attribution(spark, sf):
    """Time-decay multi-touch attribution (24 h half-life, 7-day
    lookback): conversions spread one normalized unit of credit over
    prior click/view touches (evaluation.decay_attribution — the
    fixed-point decay convention)."""
    return ev6.decay_attribution(events_df(spark, sf))


@_q("x153_srm_check", """
WITH a AS (SELECT user_id % 2 AS arm FROM events),
 c AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS observed
       FROM a GROUP BY 1),
 t AS (SELECT SUM(observed) AS n FROM c)
SELECT arm, observed,
       ROUND(t.n * (CASE WHEN arm = 0 THEN 0.5 ELSE 0.5 END), 6)
         AS expected,
       ROUND((observed - t.n * 0.5) * (observed - t.n * 0.5)
             / (t.n * 0.5), 6) AS chi2_contrib
FROM c, t
""")
def q_srm_check(spark, sf):
    """Sample-ratio-mismatch gate over a user_id-parity arm
    assignment of events (profile.srm_check): per-arm observed vs
    expected counts and chi-square contributions."""
    ev = events_df(spark, sf).select(
        (F.col("user_id") % 2).alias("arm"))
    return pf.srm_check(ev, ratios=[0.5, 0.5])


@_q("e33_hourly_xcorr", """
WITH h AS (SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS h,
                  event_type
           FROM events WHERE event_type IN ('click', 'purchase')),
 c AS (SELECT h, SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS ca,
              SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cb
       FROM h GROUP BY 1),
 sp AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
 g AS (SELECT gs.h, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
       FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM sp) gs
       LEFT JOIN c ON c.h = gs.h),
 lagd AS (
   SELECT 0 AS lag_hours, a.ca, b.cb AS cb_l
   FROM g a JOIN g b ON b.h = a.h
   UNION ALL
   SELECT 1 AS lag_hours, a.ca, b.cb AS cb_l
   FROM g a JOIN g b ON b.h - 1 = a.h)
SELECT lag_hours, CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(CAST(COUNT(*) * SUM(ca * cb_l) - SUM(ca) * SUM(cb_l)
                  AS DOUBLE)
             / SQRT(CAST(COUNT(*) * SUM(ca * ca) - SUM(ca) * SUM(ca)
                         AS DOUBLE)
                    * CAST(COUNT(*) * SUM(cb_l * cb_l)
                           - SUM(cb_l) * SUM(cb_l) AS DOUBLE)), 6)
         AS pearson_r
FROM lagd GROUP BY 1
""")
def q_hourly_xcorr(spark, sf):
    """Click→purchase hourly cross-correlation at lag 0 and 1 over the
    densified hour grid (profile.hourly_xcorr): exact integer moments,
    one sqrt-divide per lag."""
    return pf.hourly_xcorr(events_df(spark, sf))


@_q("e34_cusum_changepoint", """
WITH hrs AS (SELECT event_type AS ty,
                    epoch_us(ts::TIMESTAMP) // 3600000000 AS h
             FROM events),
 c AS (SELECT ty, h, CAST(COUNT(*) AS BIGINT) AS c
       FROM hrs GROUP BY 1, 2),
 sp AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
 g AS (SELECT t.ty, gs.h, COALESCE(c.c, 0) AS c
       FROM (SELECT DISTINCT ty FROM c) t
       CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
                   FROM sp) gs
       LEFT JOIN c ON c.ty = t.ty AND c.h = gs.h),
 d AS (SELECT ty, h,
              SUM(c) OVER (PARTITION BY ty ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS p,
              ROW_NUMBER() OVER (PARTITION BY ty ORDER BY h) AS t,
              SUM(c) OVER (PARTITION BY ty) AS s,
              COUNT(*) OVER (PARTITION BY ty) AS n
       FROM g),
 sc AS (SELECT ty, h, n, n * p - t * s AS dd FROM d),
 pick AS (SELECT ty, h, dd, n,
                 ROW_NUMBER() OVER (PARTITION BY ty
                                    ORDER BY ABS(dd) DESC, h ASC) AS rk
          FROM sc)
SELECT ty AS event_type, CAST(h AS BIGINT) AS changepoint_hour,
       CAST(ABS(dd) AS BIGINT) AS peak_cusum,
       CAST(n AS BIGINT) AS n_hours
FROM pick WHERE rk = 1
""")
def q_cusum_changepoint(spark, sf):
    """Per-stream CUSUM changepoint over the densified hourly series
    (profile.cusum_changepoint) — integer-exact end to end, no floats
    anywhere in the output."""
    return pf.cusum_changepoint(events_df(spark, sf))


@_q("e35_kaplan_meier", """
WITH pu AS (SELECT user_id,
                   MIN(epoch_us(ts::TIMESTAMP) // 86400000000) AS f,
                   MAX(epoch_us(ts::TIMESTAMP) // 86400000000) AS l
            FROM events GROUP BY 1),
 ge AS (SELECT MAX(l) AS e FROM pu),
 lt AS (SELECT pu.l - pu.f AS dur, (pu.l < ge.e) AS churned
        FROM pu, ge),
 h AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                AS deaths
       FROM lt GROUP BY 1),
 r AS (SELECT dur, n, deaths,
              SUM(n) OVER (ORDER BY dur DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS risk
       FROM h),
 s AS (SELECT dur, risk, deaths,
              CASE WHEN deaths < risk
                   THEN LN(1.0 - CAST(deaths AS DOUBLE) / risk)
                   ELSE 0.0 END AS lnterm,
              CASE WHEN deaths >= risk THEN 1 ELSE 0 END AS z
       FROM r)
SELECT CAST(dur AS BIGINT) AS duration_days,
       CAST(risk AS BIGINT) AS n_at_risk,
       deaths AS n_churned,
       CASE WHEN MAX(z) OVER (ORDER BY dur ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) = 1 THEN 0.0
            ELSE ROUND(EXP(SUM(lnterm) OVER (
                    ORDER BY dur ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW)), 6) END AS survival
FROM s QUALIFY deaths > 0
""")
def q_kaplan_meier(spark, sf):
    """User-lifetime Kaplan–Meier retention curve with censoring at
    the corpus end (evaluation.kaplan_meier): exact integer risk sets
    via a suffix sum over the duration histogram, survival as the
    ln-sum product."""
    return ev6.kaplan_meier(events_df(spark, sf))


@_q("x154_stratified_uplift", """
WITH pu AS (SELECT user_id, COUNT(*) AS n_ev,
                   MAX(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY 1),
 ar AS (SELECT CAST(user_id % 2 AS INTEGER) AS arm,
               CAST(LEAST(3, CAST(n_ev // 25 AS INTEGER))
                    AS INTEGER) AS stratum,
               conv
        FROM pu),
 ag AS (SELECT stratum,
               SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS c0,
               SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
               SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS c1
        FROM ar GROUP BY 1)
SELECT CAST(stratum AS BIGINT) AS stratum,
       CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
       ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate_control,
       ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate_treat,
       ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0, 6)
         AS uplift
FROM ag WHERE n0 > 0 AND n1 > 0
""")
def q_stratified_uplift(spark, sf):
    """Post-stratified conversion uplift between user-parity arms
    with activity-bucket strata (profile.stratified_uplift) — the
    analysis step after the x153 SRM gate."""
    return pf.stratified_uplift(events_df(spark, sf))


@_q("e36_seasonal_backtest", """
WITH hrs AS (SELECT event_type AS ty,
                    epoch_us(ts::TIMESTAMP) // 3600000000 AS h
             FROM events),
 c AS (SELECT ty, h, CAST(COUNT(*) AS BIGINT) AS c
       FROM hrs GROUP BY 1, 2),
 sp AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM c),
 g AS (SELECT t.ty, gs.h, COALESCE(c.c, 0) AS c
       FROM (SELECT DISTINCT ty FROM c) t
       CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
                   FROM sp) gs
       LEFT JOIN c ON c.ty = t.ty AND c.h = gs.h),
 l AS (SELECT ty, c,
              LAG(c, 24) OVER (PARTITION BY ty ORDER BY h) AS s,
              LAG(c, 1) OVER (PARTITION BY ty ORDER BY h) AS p
       FROM g),
 a AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n_hours_eval,
              SUM(ABS(c - s)) AS es, SUM(ABS(c - p)) AS e1
       FROM l WHERE s IS NOT NULL GROUP BY 1)
SELECT ty AS event_type, n_hours_eval,
       ROUND(CAST(es AS DOUBLE) / n_hours_eval, 6) AS mae_seasonal,
       ROUND(CAST(e1 AS DOUBLE) / n_hours_eval, 6) AS mae_naive1,
       ROUND(CAST(es AS DOUBLE) / e1, 6) AS mase
FROM a WHERE e1 > 0
""")
def q_seasonal_backtest(spark, sf):
    """Seasonal-naïve (lag-24) vs naïve-1 forecast backtest per event
    stream over the densified hour grid
    (profile.seasonal_naive_backtest): exact integer error sums,
    MASE < 1 ⇔ the daily cycle predicts."""
    return pf.seasonal_naive_backtest(events_df(spark, sf))
