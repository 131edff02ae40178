"""Round-7 additions.

Batch 1 — behavioral analytics: RFM segmentation, Markov transitions,
session-path mining, pass@k, calibration ECE, Bloom decontamination,
Benford audit.
Batch 2 (7b) — growth/labeling: DAU/WAU/MAU stickiness, market-basket
lift, L28 power-user curve, Welch t, Fleiss kappa, Bradley–Terry,
Self-BLEU, kNN-graph clustering coefficient.
Batch 3 (7c) — experimentation: 2-step Newton logistic regression,
split-conformal coverage, CUPED, hour-of-day EMD drift, exact Shapley
attribution.

All are IN the round-7 driver rotation (the _ROUND7_PRIORITY prefix in
registry.py) behind the round-6 22-query tail, so the never-sampled
backlog closes at zero this round.

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


# ---------------------------------------------- round-7b: growth analytics

@_q("e40_active_users", """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
 b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM ud),
 grid AS (SELECT CAST(x AS DATE) AS day
          FROM (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 DAY))
                AS x FROM b)),
 dau AS (SELECT d AS day, CAST(COUNT(DISTINCT u) AS BIGINT) AS dau
         FROM ud GROUP BY 1),
 wau AS (SELECT g.day, CAST(COUNT(DISTINCT u.u) AS BIGINT) AS wau
         FROM grid g JOIN ud u ON u.d BETWEEN g.day - 6 AND g.day
         GROUP BY 1),
 mau AS (SELECT g.day, CAST(COUNT(DISTINCT u.u) AS BIGINT) AS mau
         FROM grid g JOIN ud u ON u.d BETWEEN g.day - 27 AND g.day
         GROUP BY 1)
SELECT CAST(g.day AS VARCHAR) AS day,
       COALESCE(dau.dau, 0) AS dau, COALESCE(wau.wau, 0) AS wau,
       COALESCE(mau.mau, 0) AS mau,
       CASE WHEN COALESCE(mau.mau, 0) > 0
            THEN ROUND(COALESCE(dau.dau, 0) * 1.0 / mau.mau, 6)
       END AS stickiness
FROM grid g LEFT JOIN dau ON dau.day = g.day
LEFT JOIN wau ON wau.day = g.day
LEFT JOIN mau ON mau.day = g.day
""")
def q_active_users(spark, sf):
    """DAU/WAU/MAU + stickiness over the densified corpus day grid
    (profile.active_users): trailing-window distincts via bounded
    map-side explode, never a day×user-day range join. The day casts
    to string at the harness boundary only (pandas renders Spark
    DateType as date objects but DuckDB DATE as midnight
    timestamps)."""
    out = pf.active_users(events_df(spark, sf))
    return out.withColumn("day", F.col("day").cast("string"))


@_q("e41_basket_lift", """
WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 100 AS i
            FROM lineitem),
 nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS nb FROM bi),
 m AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM bi GROUP BY 1),
 p AS (SELECT a.i AS item_a, c.i AS item_b,
              CAST(COUNT(*) AS BIGINT) AS n_ab
       FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
       GROUP BY 1, 2 HAVING COUNT(*) >= 10)
SELECT p.item_a, p.item_b, p.n_ab,
       ROUND(p.n_ab * 1.0 / nb.nb, 6) AS support,
       ROUND(p.n_ab * 1.0 / ma.ni, 6) AS conf_a_to_b,
       ROUND(p.n_ab * 1.0 / mb.ni, 6) AS conf_b_to_a,
       ROUND(p.n_ab * 1.0 * nb.nb / (ma.ni * mb.ni), 6) AS lift
FROM p CROSS JOIN nb
JOIN m ma ON ma.i = p.item_a JOIN m mb ON mb.i = p.item_b
""")
def q_basket_lift(spark, sf):
    """Market-basket support/confidence/lift over part-category
    co-occurrence within orders (profile.basket_lift): the
    association-rule miner; per-basket bounded self-join, |items|²
    aggregate."""
    return pf.basket_lift(load(spark, sf, "lineitem"))


@_q("e42_power_user_curve", """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
 e AS (SELECT MAX(d) AS mx FROM ud),
 w AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS active_days
       FROM ud CROSS JOIN e WHERE d >= mx - 27 GROUP BY 1),
 t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM w)
SELECT active_days, CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(COUNT(*) * 1.0 / t.nu, 6) AS pct_users
FROM w CROSS JOIN t GROUP BY active_days, t.nu
""")
def q_power_user_curve(spark, sf):
    """The L28 power-user curve (profile.power_user_curve): trailing
    28-day active-days histogram — the habit-strength census."""
    return pf.power_user_curve(events_df(spark, sf))


# ---------------------------------------------- round-7b: stats / labeling

@_q("x159_welch_ttest", """
WITH g AS (SELECT CAST(user_id % 2 AS INTEGER) AS g,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS s,
                  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                           * CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS ss
           FROM events GROUP BY 1),
 c AS (SELECT g, n, s * 1.0 / n AS m,
              CASE WHEN n > 1
                   THEN (ss - s * 1.0 * s / n) / (n - 1) END AS v
       FROM g),
 a AS (SELECT * FROM c WHERE g = 0), b AS (SELECT * FROM c WHERE g = 1),
 se AS (SELECT a.n AS n0, b.n AS n1, a.m AS m0, b.m AS m1,
               a.v / a.n AS se0, b.v / b.n AS se1
        FROM a CROSS JOIN b)
SELECT n0, n1, ROUND(m0, 6) AS mean_cents_0, ROUND(m1, 6) AS mean_cents_1,
       CASE WHEN (se0 + se1) > 0
            THEN ROUND((m0 - m1) / sqrt(se0 + se1), 6) END AS t_stat,
       CASE WHEN (se0 + se1) > 0
            THEN ROUND((se0 + se1) * (se0 + se1)
                       / (se0 * se0 / (n0 - 1)
                          + se1 * se1 / (n1 - 1)), 6) END
         AS welch_df
FROM se
""")
def q_welch_ttest(spark, sf):
    """Welch's t between the user_id-parity arms on exact cent values
    (profile.welch_ttest): int64 moments, single division chains —
    the A/B significance gate beside x153/x154."""
    return pf.welch_ttest(events_df(spark, sf))


@_q("x160_fleiss_kappa", """
WITH r AS (SELECT UNNEST([0, 1, 2, 3, 4]) AS r),
 rated AS (SELECT d.doc_id AS s, r.r,
                  CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)
                                               || '#'
                                               || CAST(r.r AS VARCHAR)),
                                           1, 8)) AS BIGINT) % 3 AS c
           FROM documents d CROSS JOIN r),
 nij AS (SELECT s, c, CAST(COUNT(*) AS BIGINT) AS n
         FROM rated GROUP BY 1, 2),
 ps AS (SELECT s, CAST(SUM(n * n) AS BIGINT) AS s2 FROM nij GROUP BY 1),
 tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                 CAST(SUM(s2) AS BIGINT) AS s2a
          FROM ps),
 tc AS (SELECT CAST(SUM(cj * cj) AS BIGINT) AS t
        FROM (SELECT c, CAST(SUM(n) AS BIGINT) AS cj
              FROM nij GROUP BY 1))
SELECT nn AS n_subjects, CAST(5 AS BIGINT) AS n_raters,
       ROUND((s2a - nn * 5) * 1.0 / ((nn * 5) * 4), 6) AS p_bar,
       ROUND(t * 1.0 / ((nn * 5) * (nn * 5)), 6) AS p_e,
       ROUND(((s2a - nn * 5) * 1.0 / ((nn * 5) * 4)
              - t * 1.0 / ((nn * 5) * (nn * 5)))
             / (1 - t * 1.0 / ((nn * 5) * (nn * 5))), 6) AS kappa
FROM tots CROSS JOIN tc
""")
def q_fleiss_kappa(spark, sf):
    """Fleiss' kappa over 5 seeded synthetic raters × 3 categories on
    the documents table (evaluation.fleiss_kappa): all-integer
    numerators, two-division chain — multi-rater labeling QA."""
    return ev.fleiss_kappa(load(spark, sf, "documents"))


@_q("x161_bradley_terry", """
WITH ui AS (SELECT user_id AS u, event_type AS i,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
 duel AS (SELECT a.i AS ia, b.i AS ib,
                 CAST(SUM(CASE WHEN a.c > b.c THEN 1 ELSE 0 END)
                      AS BIGINT) AS w_ab,
                 CAST(SUM(CASE WHEN b.c > a.c THEN 1 ELSE 0 END)
                      AS BIGINT) AS w_ba
          FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
          WHERE a.c <> b.c GROUP BY 1, 2),
 sym AS (SELECT ia AS i, ib AS j, w_ab + w_ba AS n, w_ab AS w FROM duel
         UNION ALL
         SELECT ib, ia, w_ab + w_ba, w_ba FROM duel),
 wins AS (SELECT i, CAST(SUM(w) AS BIGINT) AS wins,
                 CAST(SUM(n) AS BIGINT) AS n_comp
          FROM sym GROUP BY 1),
 p0 AS (SELECT i, 1.0 AS p FROM wins),
 t1 AS (SELECT s.i, CAST(FLOOR(s.n / (pa.p + pb.p) * 1e9 + 0.5)
                         AS BIGINT) AS t
        FROM sym s JOIN p0 pa ON pa.i = s.i JOIN p0 pb ON pb.i = s.j),
 d1 AS (SELECT i, CAST(SUM(t) AS BIGINT) AS d FROM t1 GROUP BY 1),
 p1 AS (SELECT w.i, FLOOR(w.wins * 1e9 / (d.d / 1e9) + 0.5) / 1e9 AS p
        FROM wins w JOIN d1 d ON d.i = w.i),
 t2 AS (SELECT s.i, CAST(FLOOR(s.n / (pa.p + pb.p) * 1e9 + 0.5)
                         AS BIGINT) AS t
        FROM sym s JOIN p1 pa ON pa.i = s.i JOIN p1 pb ON pb.i = s.j),
 d2 AS (SELECT i, CAST(SUM(t) AS BIGINT) AS d FROM t2 GROUP BY 1),
 p2 AS (SELECT w.i, FLOOR(w.wins * 1e9 / (d.d / 1e9) + 0.5) / 1e9 AS p
        FROM wins w JOIN d2 d ON d.i = w.i),
 tp AS (SELECT SUM(p) AS tp FROM p2)
SELECT p2.i AS event_type, w.wins, w.n_comp AS n_comparisons,
       ROUND(p2.p / tp.tp, 6) AS rating
FROM p2 JOIN wins w ON w.i = p2.i CROSS JOIN tp
""")
def q_bradley_terry(spark, sf):
    """Bradley–Terry strengths from per-user event-type spend duels,
    2 unrolled MM iterations with 1e-9 fixed-point terms
    (evaluation.bradley_terry) — the arena-rating primitive."""
    return ev.bradley_terry(events_df(spark, sf))


@_q("x162_self_bleu", """
WITH base AS (SELECT doc_id AS id, source AS g,
                     string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
 pr AS (SELECT id, g, tk,
               LEAD(tk) OVER (PARTITION BY g ORDER BY id) AS rtk
        FROM base),
 pairs AS (SELECT * FROM pr
           WHERE rtk IS NOT NULL AND len(tk) >= 2 AND len(rtk) >= 2),
 c1 AS (SELECT id, g, UNNEST(tk) AS gr FROM pairs),
 c1c AS (SELECT id, g, gr, CAST(COUNT(*) AS BIGINT) AS cc
         FROM c1 GROUP BY 1, 2, 3),
 r1 AS (SELECT id, UNNEST(rtk) AS gr FROM pairs),
 r1c AS (SELECT id, gr, CAST(COUNT(*) AS BIGINT) AS cr
         FROM r1 GROUP BY 1, 2),
 u1 AS (SELECT c.id, c.g,
               CAST(SUM(LEAST(c.cc, COALESCE(r.cr, 0))) AS BIGINT)
                 AS clip1,
               CAST(SUM(c.cc) AS BIGINT) AS tot1
        FROM c1c c LEFT JOIN r1c r ON r.id = c.id AND r.gr = c.gr
        GROUP BY 1, 2),
 c2 AS (SELECT id, g,
               UNNEST([tk[i] || ' ' || tk[i + 1]
                       FOR i IN generate_series(1, len(tk) - 1)]) AS gr
        FROM pairs),
 c2c AS (SELECT id, g, gr, CAST(COUNT(*) AS BIGINT) AS cc
         FROM c2 GROUP BY 1, 2, 3),
 r2 AS (SELECT id,
               UNNEST([rtk[i] || ' ' || rtk[i + 1]
                       FOR i IN generate_series(1, len(rtk) - 1)]) AS gr
        FROM pairs),
 r2c AS (SELECT id, gr, CAST(COUNT(*) AS BIGINT) AS cr
         FROM r2 GROUP BY 1, 2),
 u2 AS (SELECT c.id, c.g,
               CAST(SUM(LEAST(c.cc, COALESCE(r.cr, 0))) AS BIGINT)
                 AS clip2,
               CAST(SUM(c.cc) AS BIGINT) AS tot2
        FROM c2c c LEFT JOIN r2c r ON r.id = c.id AND r.gr = c.gr
        GROUP BY 1, 2),
 pp AS (SELECT u1.g,
               CAST(FLOOR(u1.clip1 / u1.tot1 * 1e6 + 0.5) AS BIGINT)
                 AS fp1,
               CAST(FLOOR(u2.clip2 / u2.tot2 * 1e6 + 0.5) AS BIGINT)
                 AS fp2,
               CAST(FLOOR((CASE WHEN len(p.tk) >= len(p.rtk) THEN 1.0
                                ELSE len(p.tk) / len(p.rtk)
                           END
                           * sqrt((u1.clip1 / u1.tot1)
                                  * (u2.clip2 / u2.tot2))) * 1e6 + 0.5)
                    AS BIGINT) AS fb
        FROM u1 JOIN u2 ON u2.id = u1.id
        JOIN pairs p ON p.id = u1.id)
SELECT g AS source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(SUM(fp1) / 1e6 / COUNT(*), 6) AS mean_p1,
       ROUND(SUM(fp2) / 1e6 / COUNT(*), 6) AS mean_p2,
       ROUND(SUM(fb) / 1e6 / COUNT(*), 6) AS mean_self_bleu2
FROM pp GROUP BY 1
""")
def q_self_bleu(spark, sf):
    """Self-BLEU-2 diversity audit per source (evaluation.self_bleu):
    adjacent-doc candidate/reference pairs, clipped n-gram precision
    as exact int ratios, 1e-6 fixed-point pair scores."""
    return ev.self_bleu(load(spark, sf, "documents"))


def _g4_oracle_sql() -> str:
    from data_ingest_spark.harness.q_ml import _KNN_EDGES_SQL
    return f"""
WITH {_KNN_EDGES_SQL},
 d AS (SELECT src, dst FROM r WHERE rank <= 10),
 u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM d WHERE src <> dst),
 deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT a AS v FROM u UNION ALL SELECT b FROM u)
         GROUP BY 1),
 tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM u e1 JOIN u e2 ON e1.b = e2.a
         JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
 tv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS tri
        FROM (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY 1),
 pn AS (SELECT deg.v, deg.deg, COALESCE(tv.tri, 0) AS tri
        FROM deg LEFT JOIN tv ON tv.v = deg.v WHERE deg.deg >= 2),
 cc AS (SELECT CAST(FLOOR(2e6 * tri / (deg * (deg - 1)) + 0.5)
               AS BIGINT) AS cc6
        FROM pn)
SELECT CAST(LEAST(FLOOR(cc6 / 100000.0), 9) AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       ROUND(SUM(cc6) / 1e6 / COUNT(*), 6) AS mean_cc
FROM cc GROUP BY 1
"""


@_q("g4_clustering_coeff", _g4_oracle_sql())
def q_clustering_coeff(spark, sf):
    """Local clustering-coefficient histogram of the undirected k=10
    kNN graph (graph.clustering_coefficient): canonical-order triangle
    joins keyed by node, exact fixed-point bucket means — graph
    cohesion next to g2's global triangle count."""
    from data_ingest_spark.harness.q_ml import _emb_knn
    from data_ingest_spark.operators.graph import clustering_coefficient
    knn = _emb_knn(spark, sf, k=10, cached=True)
    return clustering_coefficient(knn.select("src", "dst"))


# ------------------------------------------- round-7c: experimentation

@_q("x163_logreg_newton", """
WITH b AS (SELECT CAST(FLOOR(ln(1.0 + CAST(FLOOR(value * 100 + 0.5)
                                            AS BIGINT)) * 1000000 + 0.5)
                       AS BIGINT) AS xq,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
 m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS np,
               SUM(CAST(xq AS HUGEINT)) AS sx,
               SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
               SUM(CASE WHEN y = 1 THEN CAST(xq AS HUGEINT)
                        ELSE 0 END) AS sx1
        FROM b),
 s1 AS (SELECT n, np, CAST(sx AS DOUBLE) / 1e6 AS sxd,
               CAST(sxx AS DOUBLE) / 1e12 AS sxxd,
               np - n / 2 AS g0,
               CAST(sx1 AS DOUBLE) / 1e6 - CAST(sx AS DOUBLE) / 1e6 / 2
                 AS g1
        FROM m1),
 bs AS (SELECT n, np,
               4 * (sxxd * g0 - sxd * g1)
                 / (n * sxxd - sxd * sxd) AS b0,
               4 * (n * g1 - sxd * g0)
                 / (n * sxxd - sxd * sxd) AS b1
        FROM s1),
 r2 AS (SELECT b.xq, b.y, s.b0, s.b1, s.n, s.np,
               1.0 / (1.0 + exp(-(s.b0 + s.b1 * (b.xq / 1e6)))) AS p
        FROM b CROSS JOIN bs s),
 q2 AS (SELECT n, np, b0, b1, xq,
               CAST(FLOOR(p * (1 - p) * 1e9 + 0.5) AS BIGINT) AS wq,
               CAST(FLOOR((y - p) * 1e9 + 0.5) AS BIGINT) AS rq
        FROM r2),
 m2 AS (SELECT MAX(b0) AS b0, MAX(b1) AS b1, MAX(n) AS n, MAX(np) AS np,
               CAST(SUM(CAST(wq AS HUGEINT)) AS DOUBLE) / 1e9 AS swd,
               CAST(SUM(CAST(wq AS HUGEINT) * xq) AS DOUBLE) / 1e15
                 AS swxd,
               CAST(SUM(CAST(wq AS HUGEINT) * xq * xq) AS DOUBLE) / 1e21
                 AS swxxd,
               CAST(SUM(CAST(rq AS HUGEINT)) AS DOUBLE) / 1e9 AS srd,
               CAST(SUM(CAST(rq AS HUGEINT) * xq) AS DOUBLE) / 1e15
                 AS srxd
        FROM q2)
SELECT n, np AS n_pos,
       ROUND(b0 + (swxxd * srd - swxd * srxd)
                  / (swd * swxxd - swxd * swxd), 6) AS beta0,
       ROUND(b1 + (swd * srxd - swxd * srd)
                  / (swd * swxxd - swxd * swxd), 6) AS beta1
FROM m2
""")
def q_logreg_newton(spark, sf):
    """In-engine logistic regression, 2 unrolled Newton steps
    (regression.logreg_newton2): P(purchase | ln(1+cents)) with
    decimal-exact moments and 1e-9 fixed-point per-row weights —
    fixed-iteration model TRAINING under a full value oracle."""
    from data_ingest_spark.operators.regression import logreg_newton2
    return logreg_newton2(events_df(spark, sf))


@_q("x164_conformal", """
WITH base AS (SELECT event_type AS g, user_id % 2 = 0 AS is_cal,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
 cs AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_cal,
               CAST(SUM(c) AS BIGINT) AS s_cal
        FROM base WHERE is_cal GROUP BY 1),
 sc AS (SELECT b.g, b.is_cal, cs.n_cal,
               ABS(b.c * cs.n_cal - cs.s_cal) AS nc
        FROM base b JOIN cs ON cs.g = b.g),
 qh AS (SELECT g, nc AS q, n_cal FROM (
          SELECT g, nc, n_cal,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY nc) AS r,
                 ((n_cal + 1) * 9 + 9) // 10 AS rk
          FROM sc WHERE is_cal)
        WHERE r = LEAST(rk, n_cal)),
 t AS (SELECT s.g, MAX(s.n_cal) AS n_cal,
              CAST(COUNT(*) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN s.nc <= q.q THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cov,
              MAX(q.q) AS qs
       FROM sc s JOIN qh q ON q.g = s.g WHERE NOT s.is_cal GROUP BY 1)
SELECT g AS event_type, n_cal, n_test,
       ROUND(qs * 1.0 / n_cal, 6) AS qhat_cents,
       ROUND(n_cov * 1.0 / n_test, 6) AS coverage
FROM t
""")
def q_conformal(spark, sf):
    """Split-conformal calibration audit at α = 0.1
    (evaluation.conformal_coverage): exact order-statistic q̂ over
    integer-scaled nonconformity, per-group coverage on the held-out
    half."""
    return ev.conformal_coverage(events_df(spark, sf))


@_q("x165_cuped", """
WITH ev0 AS (SELECT user_id, CAST(ts AS DATE) AS d,
                    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
             FROM events),
 d0 AS (SELECT MIN(d) AS d0 FROM ev0),
 pu AS (SELECT user_id AS u,
               CAST(SUM(CASE WHEN d - d0.d0 < 15 THEN cents ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN d - d0.d0 >= 15 THEN cents ELSE 0 END)
                    AS BIGINT) AS y
        FROM ev0 CROSS JOIN d0 GROUP BY 1),
 g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
              CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(x * y) AS BIGINT) AS sxy
       FROM pu),
 th AS (SELECT n, sx,
               CASE WHEN (sxx - sx * 1.0 * sx / n) <> 0
                    THEN (sxy - sx * 1.0 * sy / n)
                         / (sxx - sx * 1.0 * sx / n) END AS theta
        FROM g),
 arms AS (SELECT CAST(u % 2 AS INTEGER) AS arm,
                 CAST(COUNT(*) AS BIGINT) AS na,
                 CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay,
                 CAST(SUM(x * x) AS BIGINT) AS axx,
                 CAST(SUM(y * y) AS BIGINT) AS ayy,
                 CAST(SUM(x * y) AS BIGINT) AS axy
          FROM pu GROUP BY 1)
SELECT arm, na AS n_users, ROUND(theta, 6) AS theta,
       ROUND(ay * 1.0 / na, 6) AS mean_cents,
       ROUND(ay * 1.0 / na - theta * (ax * 1.0 / na - sx * 1.0 / n), 6)
         AS mean_cents_adj,
       ROUND(CASE WHEN na > 1
                   AND ((ayy - ay * 1.0 * ay / na) / (na - 1)) > 0
             THEN ((ayy - 2 * theta * axy + theta * theta * axx
                    - (ay - theta * ax) * (ay - theta * ax) / na)
                   / (na - 1))
                  / ((ayy - ay * 1.0 * ay / na) / (na - 1)) END, 6)
         AS var_ratio
FROM arms CROSS JOIN th
""")
def q_cuped(spark, sf):
    """CUPED variance reduction (profile.cuped_adjustment): pre-period
    covariate θ-adjustment per arm, exact int64 cent moments — the
    experiment-sensitivity tool beside x153/x154/x159."""
    return pf.cuped_adjustment(events_df(spark, sf))


@_q("e43_emd_drift", """
WITH per AS (SELECT event_type AS ty,
                    CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
                    CAST(COUNT(*) AS BIGINT) AS c
             FROM events GROUP BY 1, 2),
 grid AS (SELECT ty, h FROM (SELECT DISTINCT ty FROM per)
          CROSS JOIN (SELECT CAST(UNNEST(range(0, 24)) AS INTEGER) AS h)),
 dense AS (SELECT g.ty, g.h, COALESCE(per.c, 0) AS c
           FROM grid g LEFT JOIN per ON per.ty = g.ty AND per.h = g.h),
 cum AS (SELECT ty, h,
                SUM(c) OVER (PARTITION BY ty ORDER BY h
                             ROWS UNBOUNDED PRECEDING) AS cm,
                SUM(c) OVER (PARTITION BY ty) AS tot
         FROM dense),
 ac AS (SELECT h, SUM(c) AS ca FROM dense GROUP BY 1),
 acc AS (SELECT h, SUM(ca) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
                AS cma,
               SUM(ca) OVER () AS tota
         FROM ac)
SELECT cum.ty AS event_type, CAST(MAX(cum.tot) AS BIGINT) AS n_events,
       ROUND(SUM(ABS(cm * 1.0 / tot - cma * 1.0 / tota)), 6) AS emd
FROM cum JOIN acc ON acc.h = cum.h GROUP BY 1
""")
def q_emd_drift(spark, sf):
    """Hour-of-day Wasserstein-1 drift per event stream vs the corpus
    (profile.emd_drift): CDF-difference sum over the densified
    24-bin grid — the magnitude-aware drift gate beside PSI/JSD/KS."""
    return pf.emd_drift(events_df(spark, sf))


@_q("e44_shapley_attribution", """
WITH conv AS (SELECT user_id AS u,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1
                              ELSE 0 END) AS cv
              FROM events GROUP BY 1),
 ch AS (SELECT ch, CAST(ROW_NUMBER() OVER (ORDER BY ch) - 1 AS INTEGER)
               AS bit
        FROM (SELECT DISTINCT event_type AS ch FROM events
              WHERE event_type <> 'purchase')),
 tu AS (SELECT DISTINCT user_id AS u, event_type AS ch FROM events
        WHERE event_type <> 'purchase'),
 um AS (SELECT tu.u, CAST(SUM(1 << ch.bit) AS BIGINT) AS mask
        FROM tu JOIN ch ON ch.ch = tu.ch GROUP BY 1),
 census AS (SELECT COALESCE(um.mask, 0) AS mask,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(conv.cv) AS BIGINT) AS nc
            FROM conv LEFT JOIN um ON um.u = conv.u GROUP BY 1),
 kk AS (SELECT CAST(COUNT(*) AS INTEGER) AS k FROM ch),
 lattice AS (SELECT CAST(UNNEST(range(0, 1 << k)) AS BIGINT) AS m, k
             FROM kk),
 v AS (SELECT l.m, l.k,
              CASE WHEN c.n IS NOT NULL THEN c.nc * 1.0 / c.n
                   ELSE 0.0 END AS v
       FROM lattice l LEFT JOIN census c ON c.mask = l.m),
 pairs AS (SELECT v.m, v.k, v.v, ch.ch, ch.bit FROM v CROSS JOIN ch
           WHERE (v.m >> ch.bit) & 1 = 0),
 wv AS (SELECT p.m, p.k, p.v, p.ch, p.bit, v2.v AS vw
        FROM pairs p JOIN v v2 ON v2.m = p.m + (1 << p.bit)),
 cr AS (SELECT ch,
               ROUND(SUM(
                 CAST([1,1,2,6,24,120,720,5040,40320,362880,3628800,
                       39916800,479001600][CAST(bit_count(m) AS INTEGER)
                                           + 1]
                      * [1,1,2,6,24,120,720,5040,40320,362880,3628800,
                         39916800,479001600][k - 1
                                             - CAST(bit_count(m)
                                                    AS INTEGER) + 1]
                      AS DOUBLE)
                 / CAST([1,1,2,6,24,120,720,5040,40320,362880,3628800,
                         39916800,479001600][k + 1] AS DOUBLE)
                 * (vw - v)), 6) AS shapley_credit
        FROM wv GROUP BY 1),
 tc AS (SELECT ch.ch, CAST(COUNT(*) AS BIGINT) AS touched_users
        FROM um JOIN ch ON (um.mask >> ch.bit) & 1 = 1 GROUP BY 1)
SELECT cr.ch AS event_type, cr.shapley_credit,
       COALESCE(tc.touched_users, 0) AS touched_users
FROM cr LEFT JOIN tc ON tc.ch = cr.ch
""")
def q_shapley_attribution(spark, sf):
    """Exact data-driven Shapley channel attribution over the 2^k
    touchset lattice (evaluation.shapley_attribution): integer
    factorial kernel, exact-ratio coalition values, no driver-side
    math — the fair-division attribution beside e28 (last-touch) and
    e32 (time-decay)."""
    return ev.shapley_attribution(events_df(spark, sf))


@_q("e45_holt_forecast", """
WITH hrs AS (SELECT event_type AS ty,
                    CAST(FLOOR(epoch_us(ts::TIMESTAMP) / 3600000000)
                         AS BIGINT) AS h
             FROM events),
 counts AS (SELECT ty, h, CAST(COUNT(*) AS BIGINT) AS c
            FROM hrs GROUP BY 1, 2),
 span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts),
 grid AS (SELECT t.ty, g.h FROM (SELECT DISTINCT ty FROM counts) t
          CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
                      FROM span) g),
 dense AS (SELECT g.ty, g.h, CAST(COALESCE(c.c, 0) AS DOUBLE) AS c
           FROM grid g LEFT JOIN counts c ON c.ty = g.ty AND c.h = g.h),
 ser AS (SELECT ty, list(c ORDER BY h) AS ys FROM dense GROUP BY 1),
 f AS (SELECT ty, len(ys) AS n,
              list_reduce(
                [[ys[1],
                  FLOOR((ys[2] - ys[1]) * 1e9 + 0.5) / 1e9,
                  0.0]]
                || [[y, 0.0, 0.0] FOR y IN ys[2:]],
                (a, e) -> [
                  FLOOR((0.2 * e[1] + (1.0 - 0.2) * (a[1] + a[2]))
                        * 1e9 + 0.5) / 1e9,
                  FLOOR((0.1 * (FLOOR((0.2 * e[1] + (1.0 - 0.2)
                                       * (a[1] + a[2]))
                                      * 1e9 + 0.5) / 1e9 - a[1])
                         + (1.0 - 0.1) * a[2]) * 1e9 + 0.5) / 1e9,
                  FLOOR((a[3] + ABS(e[1] - (a[1] + a[2])))
                        * 1e9 + 0.5) / 1e9]) AS fv
       FROM ser WHERE len(ys) >= 2)
SELECT ty AS event_type, CAST(n AS BIGINT) AS n_hours,
       ROUND(fv[1], 6) AS level, ROUND(fv[2], 6) AS trend,
       ROUND(fv[1] + fv[2], 6) AS forecast_next,
       CASE WHEN n > 2 THEN ROUND(fv[3] / (n - 2), 6) END AS mae_1step
FROM f
""")
def q_holt_forecast(spark, sf):
    """Holt linear exponential smoothing per event stream
    (profile.holt_forecast): 1e-9-quantized engine-side fold over the
    densified hour series, walk-forward one-step MAE — the level+trend
    forecaster above e36's seasonal-naïve floor."""
    return pf.holt_forecast(events_df(spark, sf))


@_q("x166_mann_kendall", """
WITH hrs AS (SELECT event_type AS ty,
                    CAST(FLOOR(epoch_us(ts::TIMESTAMP) / 3600000000)
                         AS BIGINT) AS h
             FROM events),
 counts AS (SELECT ty, h, CAST(COUNT(*) AS BIGINT) AS c
            FROM hrs GROUP BY 1, 2),
 span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts),
 dense AS (SELECT t.ty, g.h, COALESCE(c.c, 0) AS c
           FROM (SELECT DISTINCT ty FROM counts) t
           CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
                       FROM span) g
           LEFT JOIN counts c ON c.ty = t.ty AND c.h = g.h),
 s AS (SELECT a.ty, CAST(SUM(SIGN(b.c - a.c)) AS BIGINT) AS s_stat
       FROM dense a JOIN dense b ON b.ty = a.ty AND a.h < b.h
       GROUP BY 1),
 ties AS (SELECT ty, CAST(SUM(t) AS BIGINT) AS n,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
          FROM (SELECT ty, c, CAST(COUNT(*) AS BIGINT) AS t
                FROM dense GROUP BY 1, 2)
          GROUP BY 1)
SELECT s.ty AS event_type, ties.n AS n_hours, s.s_stat,
       ROUND((ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tt)
             / 18, 6) AS var_s,
       ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                       / sqrt((ties.n * (ties.n - 1) * (2 * ties.n + 5)
                               - ties.tt) / 18)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                       / sqrt((ties.n * (ties.n - 1) * (2 * ties.n + 5)
                               - ties.tt) / 18)
                  ELSE 0.0 END, 6) AS z
FROM s JOIN ties ON ties.ty = s.ty
""")
def q_mann_kendall(spark, sf):
    """Mann–Kendall trend test per event stream
    (profile.mann_kendall): exact int S and tie-corrected variance
    over the densified hour grid — is-there-a-trend beside x122's
    slope and e34's changepoint."""
    return pf.mann_kendall(events_df(spark, sf))


def _g5_oracle_sql() -> str:
    from data_ingest_spark.harness.q_ml import _KNN_EDGES_SQL
    return f"""
WITH {_KNN_EDGES_SQL},
 d AS (SELECT src, dst FROM r WHERE rank <= 10),
 u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM d WHERE src <> dst),
 deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT a AS v FROM u UNION ALL SELECT b FROM u)
         GROUP BY 1),
 ed AS (SELECT da.deg AS x, db.deg AS y
        FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
 sym AS (SELECT x, y FROM ed UNION ALL SELECT y, x FROM ed),
 m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS sx,
              CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(y * y) AS BIGINT) AS syy,
              CAST(SUM(x * y) AS BIGINT) AS sxy
       FROM sym)
SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       CASE WHEN sqrt((sxx - sx * 1.0 * sx / m)
                      * (syy - sy * 1.0 * sy / m)) > 0
            THEN ROUND((sxy - sx * 1.0 * sy / m)
                       / sqrt((sxx - sx * 1.0 * sx / m)
                              * (syy - sy * 1.0 * sy / m)), 6)
       END AS assortativity
FROM m
"""


@_q("g5_assortativity", _g5_oracle_sql())
def q_assortativity(spark, sf):
    """Degree assortativity of the undirected k=10 kNN graph
    (graph.degree_assortativity): exact int64 moments over the
    symmetric edge list — do hubs link to hubs? Completes the graph
    census beside g2 (triangles) and g4 (clustering coefficient)."""
    from data_ingest_spark.harness.q_ml import _emb_knn
    from data_ingest_spark.operators.graph import degree_assortativity
    knn = _emb_knn(spark, sf, k=10, cached=True)
    return degree_assortativity(knn.select("src", "dst"))


@_q("x167_qte_deciles", """
WITH pu AS (SELECT user_id AS u,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS c,
                   CAST(user_id % 2 AS INTEGER) AS arm
            FROM events GROUP BY 1),
 rk AS (SELECT arm, c,
               ROW_NUMBER() OVER (PARTITION BY arm ORDER BY c, u) AS r,
               COUNT(*) OVER (PARTITION BY arm) AS n
        FROM pu),
 qs AS (SELECT CAST(UNNEST([10,20,30,40,50,60,70,80,90]) AS INTEGER)
               AS decile),
 picked AS (SELECT qs.decile, rk.arm, rk.c
            FROM rk CROSS JOIN qs
            WHERE rk.r = (qs.decile * rk.n + 99) // 100)
SELECT t.decile, t.c AS q_treat_cents, c.c AS q_control_cents,
       t.c - c.c AS qte_cents
FROM (SELECT decile, c FROM picked WHERE arm = 1) t
JOIN (SELECT decile, c FROM picked WHERE arm = 0) c
  ON c.decile = t.decile
""")
def q_qte_deciles(spark, sf):
    """Quantile treatment effects at every decile
    (profile.qte_deciles): exact int order statistics per arm,
    bit-exact outputs — the distributional view the mean-based
    x159/x165 tests can't give."""
    return pf.qte_deciles(events_df(spark, sf))


@_q("x168_nb_dispersion", """
WITH hrs AS (SELECT event_type AS ty,
                    CAST(FLOOR(epoch_us(ts::TIMESTAMP) / 3600000000)
                         AS BIGINT) AS h
             FROM events),
 counts AS (SELECT ty, h, CAST(COUNT(*) AS BIGINT) AS c
            FROM hrs GROUP BY 1, 2),
 span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM counts),
 dense AS (SELECT t.ty, COALESCE(c.c, 0) AS c
           FROM (SELECT DISTINCT ty FROM counts) t
           CROSS JOIN (SELECT UNNEST(generate_series(h0, h1)) AS h
                       FROM span) g
           LEFT JOIN counts c ON c.ty = t.ty AND c.h = g.h),
 m AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(c) AS BIGINT) AS s,
              CAST(SUM(c * c) AS BIGINT) AS ss
       FROM dense GROUP BY 1),
 v AS (SELECT ty, n, s * 1.0 / n AS mean,
              (ss - s * 1.0 * s / n) / (n - 1) AS var
       FROM m)
SELECT ty AS event_type, n AS n_hours,
       ROUND(mean, 6) AS mean_per_hour,
       ROUND(var, 6) AS var_per_hour,
       ROUND(var / mean, 6) AS dispersion_index,
       CASE WHEN var > mean THEN ROUND(mean / var, 6) END AS nb_p,
       CASE WHEN var > mean THEN ROUND(mean * mean / (var - mean), 6)
       END AS nb_r
FROM v
""")
def q_nb_dispersion(spark, sf):
    """Hourly-count overdispersion audit + method-of-moments
    negative-binomial fit per stream (profile.nb_dispersion) — the
    Poisson sanity check behind rate alerting."""
    return pf.nb_dispersion(events_df(spark, sf))


@_q("e46_diff_in_diff", """
WITH ev0 AS (SELECT user_id, CAST(ts AS DATE) AS d,
                    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
             FROM events),
 d0 AS (SELECT MIN(d) AS d0 FROM ev0),
 pu AS (SELECT user_id AS u,
               CAST(SUM(CASE WHEN d - d0.d0 < 15 THEN cents ELSE 0 END)
                    AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN d - d0.d0 >= 15 THEN cents ELSE 0 END)
                    AS BIGINT) AS post
        FROM ev0 CROSS JOIN d0 GROUP BY 1),
 g AS (SELECT CAST(u % 2 AS INTEGER) AS arm,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(pre) AS BIGINT) AS sp,
              CAST(SUM(post) AS BIGINT) AS so
       FROM pu GROUP BY 1),
 t AS (SELECT * FROM g WHERE arm = 1), c AS (SELECT * FROM g WHERE arm = 0)
SELECT t.n AS n_treat, c.n AS n_control,
       ROUND(t.sp * 1.0 / t.n, 6) AS treat_pre,
       ROUND(t.so * 1.0 / t.n, 6) AS treat_post,
       ROUND(c.sp * 1.0 / c.n, 6) AS control_pre,
       ROUND(c.so * 1.0 / c.n, 6) AS control_post,
       ROUND((t.so * 1.0 / t.n - t.sp * 1.0 / t.n)
             - (c.so * 1.0 / c.n - c.sp * 1.0 / c.n), 6) AS did_cents
FROM t CROSS JOIN c
""")
def q_diff_in_diff(spark, sf):
    """Difference-in-differences on pre/post per-user cent totals
    between the parity arms (profile.diff_in_diff) — the
    observational causal estimate completing the experimentation
    battery."""
    return pf.diff_in_diff(events_df(spark, sf))
