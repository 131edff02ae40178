"""Round-7 additions: behavioral analytics (RFM segmentation, Markov
transitions, session-path mining), eval-suite primitives (pass@k,
calibration ECE), a Bloom-position-set decontamination sibling of the
exact x34 join, and a Benford leading-digit audit.

Registered AFTER the round-7 driver-verification rotation (the
_ROUND7_PRIORITY prefix in registry.py) — new queries never displace
the fronted re-sample set (round-6 verdict ask #1 discipline).

The shared ``_q`` decorator writes into registry.REGISTRY at import
time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingest_spark.extensions import dedup as dd
from data_ingest_spark.extensions import evaluation as ev
from data_ingest_spark.extensions import profile as pf
from data_ingest_spark.harness.q_extensions import _shingle_ctes
from data_ingest_spark.harness.registry import _q, events_df, load

# ------------------------------------------------------ event behavior

@_q("e37_rfm_segments", """
WITH pu AS (SELECT user_id,
                   MAX(epoch_us(ts::TIMESTAMP)) AS lastus,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY 1),
 ge AS (SELECT MAX(lastus) AS e FROM pu),
 rd AS (SELECT pu.*, CAST(FLOOR((ge.e - pu.lastus) / 86400000000.0)
                          AS BIGINT) AS rec_days
        FROM pu, ge),
 sc AS (SELECT freq, cents,
               NTILE(3) OVER (ORDER BY rec_days ASC, user_id ASC) AS r,
               NTILE(3) OVER (ORDER BY freq DESC, user_id ASC) AS f,
               NTILE(3) OVER (ORDER BY cents DESC, user_id ASC) AS m
        FROM rd)
SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       ROUND(SUM(freq) * 1.0 / COUNT(*), 6) AS avg_events
FROM sc GROUP BY 1, 2, 3
""")
def q_rfm_segments(spark, sf):
    """RFM segmentation with exact cent sums and total-order ntile
    tiles (profile.rfm_segments) — the engagement-stratification key
    for weighted sampling."""
    return pf.rfm_segments(events_df(spark, sf))


@_q("e38_markov_transitions", """
WITH e AS (SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS us
           FROM events),
 nx AS (SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id) AS to_type
        FROM e),
 c AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
       FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
""")
def q_markov_transitions(spark, sf):
    """First-order event-type Markov transition table
    (profile.markov_transitions): exact pair counts, one division per
    row for P(to | from)."""
    return pf.markov_transitions(events_df(spark, sf))


@_q("e39_session_paths", """
WITH e AS (SELECT user_id, event_id, event_type,
                  epoch_us(ts::TIMESTAMP) AS us
           FROM events),
 l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS pus
       FROM e),
 s AS (SELECT *, SUM(CASE WHEN pus IS NULL OR us - pus > 1800000000
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
       FROM l),
 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                    ORDER BY us, event_id) AS rn
       FROM s),
 p AS (SELECT user_id, sid,
              string_agg(event_type, '>' ORDER BY us, event_id) AS path
       FROM r WHERE rn <= 8 GROUP BY 1, 2)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY 1 ORDER BY n_sessions DESC, path ASC LIMIT 20
""")
def q_session_paths(spark, sf):
    """Top-20 session paths at a 30-minute inactivity split
    (evaluation.session_paths) — funnel DISCOVERY next to the known-
    funnel checks e6/e29."""
    return ev.session_paths(events_df(spark, sf))


# ------------------------------------------------------ eval primitives

@_q("x156_pass_at_k", """
WITH pt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS c
            FROM events GROUP BY 1),
 ks AS (SELECT UNNEST([1, 5, 10]) AS k),
 pk AS (SELECT k, n, c,
               CASE WHEN n < k THEN NULL
                    WHEN c >= n THEN 1.0
                    WHEN n - c < k THEN 1.0
                    ELSE ROUND(1.0 - list_reduce(
                        [1.0] || [CAST(n - c - i AS DOUBLE) / (n - i)
                                  FOR i IN range(0, k)],
                        (a, b) -> a * b), 6) END AS pkv
        FROM pt, ks),
 fp AS (SELECT k, CAST(FLOOR(pkv * 1000000 + 0.5) AS BIGINT) AS fpv
        FROM pk WHERE pkv IS NOT NULL)
SELECT CAST(k AS INTEGER) AS k, CAST(COUNT(*) AS BIGINT) AS n_tasks,
       ROUND(SUM(fpv) / 1000000.0 / COUNT(*), 6) AS mean_pass_at_k
FROM fp GROUP BY 1
""")
def q_pass_at_k(spark, sf):
    """pass@{1,5,10} (Chen et al. 2021 eq. 1) over per-user attempt
    outcomes (evaluation.pass_at_k): the ≤k-term probability product
    folds left-to-right in both engines over exact (n, c)."""
    return ev.pass_at_k(events_df(spark, sf))


@_q("x157_calibration_ece", """
WITH b AS (SELECT LEAST(GREATEST(CAST(FLOOR(value * 100 + 0.5)
                                      AS BIGINT), 0), 10000) AS fp,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END AS hit
           FROM events),
 g AS (SELECT CAST(LEAST(FLOOR(fp * 10 / 10000.0), 9) AS INTEGER)
                AS bin,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(fp) AS BIGINT) AS sfp,
              CAST(SUM(hit) AS BIGINT) AS sh
       FROM b GROUP BY 1),
 t AS (SELECT SUM(n) AS tot FROM g)
SELECT bin, n,
       ROUND(sfp / 10000.0 / n, 6) AS mean_conf,
       ROUND(sh * 1.0 / n, 6) AS accuracy,
       ROUND(ABS(sh * 1.0 / n - sfp / 10000.0 / n), 6) AS gap,
       ROUND(ABS(sh * 1.0 / n - sfp / 10000.0 / n) * n / t.tot, 6)
         AS ece_contrib
FROM g, t
""")
def q_calibration_ece(spark, sf):
    """Binned calibration audit (Guo et al. 2017 ECE) of the event
    value as a confidence against purchase outcomes
    (evaluation.calibration_ece): exact fixed-point confidences, all
    doubles are single division chains over int aggregates."""
    return ev.calibration_ece(events_df(spark, sf))


# ------------------------------------------------- curation / profiling

@_q("x155_bloom_decontam", f"""
WITH bench0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
 corpus0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
 src AS (SELECT * FROM bench0),{_shingle_ctes('src')},
 bpos AS (SELECT DISTINCT
            CAST(concat('0x', substr(md5(CAST(s.i AS VARCHAR) || '|'
                                         || shx.shingle), 1, 8))
                 AS BIGINT) % 1048576 AS p
          FROM shx, (SELECT UNNEST([0, 1, 2]) AS i) s),
 ctoks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
           FROM corpus0),
 cshl AS (SELECT doc_id,
            CASE WHEN len(tk) >= 3
                 THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                       FOR i IN generate_series(1, len(tk) - 2)]
                 ELSE [array_to_string(tk, ' ')] END AS shingles
          FROM ctoks),
 cshx AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM cshl),
 cpos AS (SELECT doc_id, shingle,
                 CAST(concat('0x', substr(md5(CAST(s.i AS VARCHAR) || '|'
                                              || shingle), 1, 8))
                      AS BIGINT) % 1048576 AS p
          FROM cshx, (SELECT UNNEST([0, 1, 2]) AS i) s),
 fl AS (SELECT c.doc_id, c.shingle,
               CASE WHEN SUM(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0
                                  END) = 3 THEN 1 ELSE 0 END AS flag
        FROM cpos c LEFT JOIN bpos b ON b.p = c.p
        GROUP BY 1, 2)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(flag) AS BIGINT) AS n_flagged,
       SUM(flag) > 0 AS contaminated
FROM fl GROUP BY 1
""")
def q_bloom_decontam(spark, sf):
    """Bloom-position-set decontamination (dedup.bloom_contaminate)
    against the x34 benchmark slice (doc_id % 97 = 0): 2^20 positions,
    3 md5-prefix hashes; a corpus shingle flags iff all three of its
    positions are set — bit-identical to a packed-bitmap Bloom with
    the same hash family, and the approximate sibling whose FP rate
    x34's exact join audits."""
    docs = load(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dd.bloom_contaminate(corpus, bench)


@_q("x158_benford", """
WITH c AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
 d AS (SELECT event_type,
              CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER)
                AS digit,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM c WHERE cents > 0 GROUP BY 1, 2),
 p AS (SELECT UNNEST([0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
                      0.066947, 0.057992, 0.051153, 0.045757]) AS pr,
              UNNEST(range(1, 10)) AS digit),
 t AS (SELECT event_type, SUM(n) AS tot FROM d GROUP BY 1)
SELECT d.event_type, d.digit, d.n AS observed,
       ROUND(t.tot * p.pr, 6) AS expected,
       ROUND((d.n - t.tot * p.pr) * (d.n - t.tot * p.pr)
             / (t.tot * p.pr), 6) AS chi2_contrib
FROM d JOIN t ON t.event_type = d.event_type
JOIN p ON p.digit = d.digit
""")
def q_benford(spark, sf):
    """Leading-digit Benford audit per event stream
    (profile.benford_deviation): the digit comes from the exact cent
    value's decimal string — zero libm — with the Benford expectation
    as shared 6dp literals."""
    return pf.benford_deviation(events_df(spark, sf))
