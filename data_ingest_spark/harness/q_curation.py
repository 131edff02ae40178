"""Evaluation / curation batches (rounds 3b-5): ranking metrics, votes, mixing/packing, BPE, BM25, drift, entity resolution, PPJoin, SimHash, calibration/agreement statistics.

Split from the monolithic harness/registry.py in round 6 (review-
size ask); registration order and content unchanged. The shared
``_q`` decorator writes into registry.REGISTRY at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from data_ingest_spark.operators import (emptydrops as ed, filters as fl,
                                         joins as jn, merge as mg,
                                         metrics as mx, normalize as nz,
                                         regression as rg, windows as wd)

from data_ingest_spark.harness.registry import (_q, load, expr_df,
                                                _EXPR_SQL)
from data_ingest_spark.extensions import dedup as dd  # noqa: E402
from data_ingest_spark.extensions import multimodal as mm  # noqa: E402
from data_ingest_spark.extensions import similarity as sim  # noqa: E402
from data_ingest_spark.extensions import text as tx  # noqa: E402
from data_ingest_spark.harness.registry import events_df  # noqa: E402
from data_ingest_spark.harness.q_extensions import (_DUP_SQL,  # noqa: E402
    _NEARDUP_SQL, _SIMHASH_BITS, _SIMHASH_CONCAT, _dup_corpus,
    _neardup_corpus, _shingle_ctes)
from data_ingest_spark.harness.q_ml import (_KNN_EDGES_SQL, _emb_knn,  # noqa: E402
                                            _emb_pc_arr)

# ------------------------------------------- evaluation / curation (round 3b)

from data_ingest_spark.extensions import evaluation as ev  # noqa: E402

#: Shared int64 NDCG constants — embedded as literals in BOTH the Spark
#: plan and the DuckDB oracle, so the DCG sum is exact integer math on
#: each side (no cross-engine libm log2 drift).
_W10 = ev.dcg_weights_fp(10)
_I10 = ev.idcg_prefix_fp(10)


@_q("x77_ranking_metrics", f"""
WITH ranked AS (
  SELECT user_id, event_id, value, (event_type = 'purchase') AS relevant,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events),
per AS (
  SELECT user_id,
         CAST(MIN(CASE WHEN relevant THEN rk END) AS INTEGER)
           AS first_rel_rank,
         CAST(COALESCE(SUM(CASE WHEN relevant AND rk <= 10
                           THEN ({_W10})[rk] ELSE 0 END), 0) AS BIGINT)
           AS dcg_fp,
         CAST(COUNT(CASE WHEN relevant THEN 1 END) AS BIGINT) AS n_relevant
  FROM ranked GROUP BY 1)
SELECT user_id, first_rel_rank, n_relevant,
       ROUND(CASE WHEN first_rel_rank IS NULL THEN 0.0
                  ELSE 1.0 / first_rel_rank END, 9) AS rr,
       ROUND(CASE WHEN n_relevant = 0 THEN 0.0
                  ELSE dcg_fp / ({_I10})[LEAST(n_relevant, 10)] END, 9)
         AS ndcg_k
FROM per
""")
def q_ranking_metrics(spark, sf):
    """Retrieval-quality gate: per-user MRR + NDCG@10 over the scored
    event list, relevance = purchase. Scaled-int DCG weights make the
    metric hash-exact cross-engine."""
    evdf = events_df(spark, sf).withColumn(
        "relevant", F.col("event_type") == F.lit("purchase"))
    return ev.ranking_metrics(evdf, k=10)


@_q("x78_majority_vote", """
WITH votes AS (SELECT user_id % 50 AS item, event_type AS label FROM events),
c AS (SELECT item, label, CAST(COUNT(*) AS BIGINT) AS votes
      FROM votes GROUP BY 1, 2),
r AS (SELECT item, label, votes,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY votes DESC, label ASC) AS rk,
             CAST(SUM(votes) OVER (PARTITION BY item) AS BIGINT)
               AS total_votes
      FROM c)
SELECT item, label AS majority_label, votes, total_votes,
       ROUND(votes / total_votes, 9) AS agreement
FROM r WHERE rk = 1
""")
def q_majority_vote(spark, sf):
    """Annotation aggregation: majority label per item (users hashed
    into 50 items, event_type as the vote) with deterministic
    tiebreak + agreement ratio."""
    votes = events_df(spark, sf).select(
        (F.col("user_id") % 50).alias("item"),
        F.col("event_type").alias("label"))
    return ev.majority_vote(votes)


@_q("x79_epoch_shuffle", """
WITH r AS (SELECT doc_id,
                  CAST(ROW_NUMBER() OVER (
                         ORDER BY md5('17:' || CAST(doc_id AS VARCHAR)),
                                  doc_id) - 1 AS BIGINT) AS pos
           FROM documents)
SELECT doc_id, pos, CAST(pos % 8 AS INTEGER) AS shard FROM r
""")
def q_epoch_shuffle(spark, sf):
    """Deterministic global training-order shuffle (seed 17, 8 shards)
    via the bucketed two-pass rank — no single-task global sort."""
    from data_ingest_spark.extensions.sampling import epoch_shuffle
    return epoch_shuffle(load(spark, sf, "documents"),
                         seed=17, num_shards=8)


@_q("x80_mix_quota", r"""
WITH toks AS (SELECT source, doc_id,
                     CAST(len(regexp_extract_all(
                       lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                       AS BIGINT) AS n_tokens
              FROM documents),
s AS (SELECT source, ROW_NUMBER() OVER (ORDER BY source) AS idx,
             COUNT(*) OVER () AS n
      FROM (SELECT DISTINCT source FROM toks)),
q AS (SELECT source, CAST(40000 // n
             + CASE WHEN idx <= 40000 % n THEN 1 ELSE 0 END AS BIGINT)
        AS quota FROM s),
c AS (SELECT t.source, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY t.source
                    ORDER BY n_tokens DESC, doc_id ASC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
             quota
      FROM toks t JOIN q ON t.source = q.source)
SELECT source, doc_id, n_tokens, cum_tokens, quota
FROM c WHERE cum_tokens <= quota
""")
def q_mix_quota(spark, sf):
    """Exact-to-the-token corpus mixing: equal largest-remainder token
    quotas per source, greedy per-source prefix."""
    from data_ingest_spark.extensions.packing import mix_quota
    toks = tx.token_count(load(spark, sf, "documents")).select(
        "source", "doc_id", "n_tokens")
    return mix_quota(toks, budget=40000)


@_q("x81_preference_pairs", """
WITH r AS (SELECT user_id, event_id, value,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY value DESC, event_id ASC) AS rk_top,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY value ASC, event_id DESC) AS rk_bot
           FROM events WHERE event_type = 'click'),
t AS (SELECT user_id, event_id AS chosen_id, value AS cs
      FROM r WHERE rk_top = 1),
b AS (SELECT user_id, event_id AS rejected_id, value AS rs
      FROM r WHERE rk_bot = 1)
SELECT t.user_id AS user_id, chosen_id, rejected_id,
       ROUND(cs - rs, 9) AS margin
FROM t JOIN b ON t.user_id = b.user_id WHERE cs > rs
""")
def q_preference_pairs(spark, sf):
    """DPO/RM pair builder: per user the best- and worst-scored click
    with deterministic tiebreaks; one grouped struct-min/max pass."""
    clicks = events_df(spark, sf).filter(F.col("event_type") == "click")
    return ev.preference_pairs(clicks)


@_q("x82_lloyd_step", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                    AS qe
           FROM embeddings),
c AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id < 4),
d AS (SELECT q.vec_id, c.cid, q.qe,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                  AS BIGINT) AS d2
      FROM q CROSS JOIN c),
a AS (SELECT vec_id, cid, qe FROM (
        SELECT vec_id, cid, qe,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM d) WHERE rk = 1),
x AS (SELECT cid, CAST(t.i AS INT) AS dim, qe[t.i] AS val
      FROM a CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) t)
SELECT cid, dim, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(val) * 1.0 / COUNT(*), 6) AS mean_q
FROM x GROUP BY 1, 2
""")
def q_lloyd_step(spark, sf):
    """One exact fixed-point Lloyd iteration over the embeddings table
    (4 deterministic seed centroids) — the KMeans-IVF coarse-quantizer
    refinement under the full value oracle."""
    from data_ingest_spark.extensions.similarity import lloyd_step
    return lloyd_step(load(spark, sf, "embeddings"), k=4)


@_q("x85_length_buckets", r"""
WITH toks AS (SELECT CAST(len(regexp_extract_all(
                lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n
              FROM documents),
bk AS (SELECT n, CAST(CASE WHEN n > 64 THEN 1 ELSE 0 END
              + CASE WHEN n > 128 THEN 1 ELSE 0 END
              + CASE WHEN n > 256 THEN 1 ELSE 0 END
              + CASE WHEN n > 512 THEN 1 ELSE 0 END AS INTEGER) AS b
       FROM toks),
agg AS (SELECT b AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS sum_tokens,
               CAST(MAX(n) AS BIGINT) AS mx
        FROM bk GROUP BY 1),
p AS (SELECT bucket,
             CAST(CASE bucket WHEN 0 THEN 64 WHEN 1 THEN 128
                  WHEN 2 THEN 256 WHEN 3 THEN 512 ELSE mx END AS BIGINT)
               AS pad_target,
             n_docs, sum_tokens FROM agg)
SELECT bucket, pad_target, n_docs, sum_tokens,
       CAST(pad_target * n_docs - sum_tokens AS BIGINT) AS waste_tokens,
       ROUND((pad_target * n_docs - sum_tokens) * 1.0
             / (pad_target * n_docs), 9) AS waste_frac
FROM p
""")
def q_length_buckets(spark, sf):
    """Dynamic-batching audit: boundary buckets over token counts with
    exact padding-waste accounting."""
    from data_ingest_spark.extensions.packing import length_buckets
    toks = tx.token_count(load(spark, sf, "documents"))
    return length_buckets(toks)


@_q("x86_soft_dedup", f"""
WITH corpus AS ({_DUP_SQL}),
 s AS (SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cluster_size
       FROM corpus GROUP BY 1)
SELECT c.doc_id, s.cluster_size,
       ROUND(1.0 / s.cluster_size, 9) AS weight
FROM corpus c JOIN s ON md5(c.text) = s.h
""")
def q_soft_dedup(spark, sf):
    """Soft dedup on the planted-duplicate corpus: per-doc sampling
    weight 1/|content cluster| instead of a hard drop."""
    return dd.soft_dedup_weights(_dup_corpus(spark, sf))


@_q("x87_hard_negatives", """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
 s AS (SELECT a.vec_id AS ida, b.vec_id AS idb,
              ROUND(list_dot_product(a.e, b.e)
                    / (sqrt(list_dot_product(a.e, a.e))
                       * sqrt(list_dot_product(b.e, b.e))), 6) AS cos
       FROM v a JOIN v b ON a.label <> b.label),
 r AS (SELECT ida, idb, cos,
              ROW_NUMBER() OVER (PARTITION BY ida
                                 ORDER BY cos DESC, idb) AS rk
       FROM s)
SELECT ida AS vec_id, idb AS neg_id, cos AS cosine,
       CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 2
""")
def q_hard_negatives(spark, sf):
    """Contrastive hard-negative mining: per vector, the 2 most-similar
    vectors with a different label."""
    from data_ingest_spark.extensions.similarity import hard_negatives
    return hard_negatives(load(spark, sf, "embeddings"), k=2)


@_q("x89_source_overlap", """
WITH corpus AS (SELECT source, text FROM documents UNION ALL
                SELECT 'mirror' AS source, text
                FROM documents WHERE doc_id % 5 = 0),
 h AS (SELECT DISTINCT source AS s, md5(text) AS hh FROM corpus)
SELECT a.s AS source_a, b.s AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM h a JOIN h b ON a.hh = b.hh AND a.s < b.s
GROUP BY 1, 2
""")
def q_source_overlap(spark, sf):
    """Cross-source content overlap on a corpus with a planted mirror
    feed (every 5th doc re-ingested under source='mirror')."""
    from data_ingest_spark.extensions.profile import source_overlap
    docs = load(spark, sf, "documents")
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(F.lit("mirror").alias("source"), "text"))
    return source_overlap(corpus)


@_q("e27_time_to_convert", """
WITH s AS (SELECT user_id, MIN(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
 p AS (SELECT user_id, MIN(ts) AS t1 FROM events
       WHERE event_type = 'purchase' GROUP BY 1),
 d AS (SELECT s.user_id,
              CAST(date_diff('second', t0, t1) AS BIGINT) AS sec
       FROM s JOIN p ON s.user_id = p.user_id WHERE t1 >= t0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(sec) AS BIGINT) AS min_s,
       ROUND(quantile_cont(sec, 0.5), 6) AS p50_s,
       ROUND(quantile_cont(sec, 0.9), 6) AS p90_s,
       CAST(MAX(sec) AS BIGINT) AS max_s
FROM d
""")
def q_time_to_convert(spark, sf):
    """Conversion-lag distribution: first signup -> first purchase per
    user, exact p50/p90 over the lags. Two pushdown-filtered scans,
    grouped mins, one join, one exact-percentile aggregate."""
    ev = events_df(spark, sf)
    s = (ev.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t0")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    d = (s.join(p, "user_id").filter(F.col("t1") >= F.col("t0"))
         .select((F.unix_timestamp("t1") - F.unix_timestamp("t0"))
                 .cast("long").alias("sec")))
    return d.agg(
        F.count("*").cast("long").alias("n_users"),
        F.min("sec").cast("long").alias("min_s"),
        F.round(F.expr("percentile(sec, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(sec, 0.9)"), 6).alias("p90_s"),
        F.max("sec").cast("long").alias("max_s"))


@_q("x88_ngram_novelty", f"""
WITH corpus AS ({_DUP_SQL}),{_shingle_ctes('corpus')},
 fs AS (SELECT shingle, MIN(doc_id) AS first_id FROM shx GROUP BY 1)
SELECT x.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(CASE WHEN f.first_id = x.doc_id THEN 1 END) AS BIGINT)
         AS n_novel,
       ROUND(COUNT(CASE WHEN f.first_id = x.doc_id THEN 1 END) * 1.0
             / COUNT(*), 9) AS novelty
FROM shx x JOIN fs f ON f.shingle = x.shingle
GROUP BY 1
""")
def q_ngram_novelty(spark, sf):
    """Content novelty in id order over the planted-duplicate corpus:
    duplicate copies score 0.0 novelty, originals near 1.0."""
    return dd.ngram_novelty(_dup_corpus(spark, sf))


@_q("m9_mnn_anchors", """
WITH p AS (SELECT CAST(vec_id AS VARCHAR) AS id, label,
                  embedding::DOUBLE[] AS e FROM embeddings),
 a AS (SELECT id, e FROM p WHERE label = 0),
 b AS (SELECT id, e FROM p WHERE label = 1),
 d AS (SELECT a.id AS ida, b.id AS idb,
              list_sum(list_transform(range(1, 65),
                i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i]))) AS d2
       FROM a CROSS JOIN b),
 r AS (SELECT ida, idb, ROUND(d2, 6) AS d2r,
              ROW_NUMBER() OVER (PARTITION BY ida
                                 ORDER BY ROUND(d2, 6), idb) AS ra,
              ROW_NUMBER() OVER (PARTITION BY idb
                                 ORDER BY ROUND(d2, 6), ida) AS rb
       FROM d)
SELECT ida, idb, d2r AS d2 FROM r WHERE ra <= 5 AND rb <= 5
""")
def q_mnn_anchors(spark, sf):
    """Mutual-nearest-neighbor anchors between batches 0 and 1 of the
    embeddings table — the hash-checkable exact core of the M9
    integration's anchor search."""
    from data_ingest_spark.operators.integrate import mnn_anchor_pairs
    return mnn_anchor_pairs(_emb_pc_arr(spark, sf), "0", "1", k=5)


#: Static BPE merge artifact for x84 (trained by bpe_train at sf0.01,
#: n_merges=8 — a tokenizer ships as a frozen artifact, so the encode
#: query embeds it in BOTH the Spark plan and the DuckDB oracle).
#: All symbols alphanumeric ⇒ safe to splice into SQL literals.
_BPE_MERGES = [("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
               ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u")]


def _bpe_fold_sql(inner: str, left: str, right: str) -> str:
    m = left + right
    return (f"list_reduce(list_transform({inner}, c -> [c]), "
            f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{left}' "
            f"AND x[1] = '{right}' "
            f"THEN list_concat(acc[1:len(acc)-1], ['{m}']) "
            f"ELSE list_concat(acc, x) END)")


def _bpe_encode_sql(merges: list[tuple[str, str]]) -> str:
    expr = "list_transform(range(1, length(w) + 1), i -> substr(w, i, 1))"
    for left, right in merges:
        expr = _bpe_fold_sql(expr, left, right)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\s+')) AS w,
         generate_subscripts(string_split_regex(lower(text), '\s+'), 1)
           AS pos
  FROM documents),
enc AS (SELECT doc_id, pos, {expr} AS t
        FROM toks WHERE length(w) >= 1),
doc AS (SELECT doc_id, flatten(list(t ORDER BY pos)) AS tt
        FROM enc GROUP BY doc_id)
SELECT doc_id, CAST(len(tt) AS BIGINT) AS n_tokens,
       array_to_string(tt, ' ') AS tokens_str
FROM doc
"""


def _bpe_round_sql(i: int) -> str:
    """One unrolled BPE training round: pair counts over the round's
    vocab state, argmax merge (count desc, pair asc, min_count 2),
    apply the merge. An empty m{i} (best pair < 2) empties every later
    state — exactly the trainer's early ``break``."""
    return f"""
px{i} AS (SELECT f, UNNEST(CASE WHEN len(seq) > 1
            THEN list_transform(range(1, len(seq)),
                 j -> {{'l': seq[j], 'r': seq[j+1]}})
            ELSE []::STRUCT(l VARCHAR, r VARCHAR)[] END) AS u
          FROM s{i - 1}),
p{i} AS (SELECT u.l AS l, u.r AS r, SUM(f) AS c FROM px{i} GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} WHERE c >= 2
                      ORDER BY c DESC, l, r LIMIT 1),
s{i} AS MATERIALIZED (
  SELECT f, list_reduce(list_transform(seq, ch -> [ch]),
        (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.l AND x[1] = m.r
                    THEN list_concat(acc[1:len(acc)-1], [m.l || m.r])
                    ELSE list_concat(acc, x) END) AS seq
  FROM s{i - 1} CROSS JOIN m{i} m)"""


def _bpe_train_sql(n_merges: int = 8) -> str:
    rounds = ",".join(_bpe_round_sql(i) for i in range(1, n_merges + 1))
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS rank, l AS \"left\", "
        f"r AS \"right\", l || r AS merged, CAST(c AS BIGINT) AS pair_count "
        f"FROM m{i}" for i in range(1, n_merges + 1))
    return rf"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents),
s0 AS MATERIALIZED (
  SELECT COUNT(*) AS f,
         list_transform(range(1, length(w) + 1), i -> substr(w, i, 1))
           AS seq
  FROM toks WHERE length(w) >= 1 GROUP BY w),
{rounds}
{finals}
"""


@_q("x83_bpe_train", _bpe_train_sql(8))
def q_bpe_train(spark, sf):
    """Distributed BPE training over the documents corpus, now under a
    FULL value oracle: the SQL unrolls the same 8 greedy merge rounds
    (frequency-weighted pair counts over the vocab state, argmax with
    count-desc/pair-asc tie-break, min_count=2 early stop) with
    MATERIALIZED per-round states. Parity is additionally pinned by
    the hypothesis mirror in tests/test_bpe.py. batch=4 exercises the
    driver-batched scheduler (safe disjoint prefix — provably
    bit-identical merges to the sequential loop, so the unrolled
    sequential SQL oracle is unchanged)."""
    from data_ingest_spark.extensions.bpe import bpe_train
    return bpe_train(load(spark, sf, "documents"), n_merges=8, batch=4)


@_q("x84_bpe_encode", _bpe_encode_sql(_BPE_MERGES))
def q_bpe_encode(spark, sf):
    """BPE tokenization with the frozen merge artifact: the per-merge
    Catalyst array fold (no UDF) under the full value oracle."""
    from data_ingest_spark.extensions.bpe import bpe_encode
    return bpe_encode(load(spark, sf, "documents"), _BPE_MERGES)


@_q("e26_incremental_rollup", """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM events GROUP BY 1, 2
""")
def q_incremental_rollup(spark, sf):
    """Incremental materialized-rollup maintenance: history state
    (ts < Jan 21) merged with the new batch's partial state must
    reproduce the full recompute — which is exactly what the oracle
    computes. DECIMAL sums make the merge associativity exact."""
    from data_ingest_spark.extensions.cdc import agg_state, merge_agg_state
    evdf = events_df(spark, sf)
    cutoff = F.lit("2024-01-21 00:00:00").cast("timestamp")
    keys = ["user_id", "event_type"]
    hist = agg_state(evdf.filter(F.col("ts") < cutoff), keys)
    batch = agg_state(evdf.filter(F.col("ts") >= cutoff), keys)
    merged = merge_agg_state(hist, batch, keys)
    return merged.select(
        "user_id", "event_type", "cnt",
        F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        "min_ts", "max_ts")


@_q("x93_rrf_fusion", r"""
WITH lexs AS (SELECT doc_id,
        CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t IN ('data', 'query', 'sort', 'merge'))) AS BIGINT) AS s
      FROM documents),
 lcand AS (SELECT doc_id, s FROM lexs ORDER BY s DESC, doc_id LIMIT 100),
 lrank AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id)
                AS BIGINT) AS lex_rank FROM lcand),
 a AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
 sems AS (SELECT vec_id AS doc_id,
          ROUND(list_dot_product(qv, cv)
                / (sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(cv, cv))), 6) AS c
          FROM (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)
               CROSS JOIN a),
 scand AS (SELECT doc_id, c FROM sems ORDER BY c DESC, doc_id LIMIT 100),
 srank AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, doc_id)
                AS BIGINT) AS sem_rank FROM scand),
 fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                  l.lex_rank, s.sem_rank,
                  ROUND(COALESCE(1.0 / (60 + l.lex_rank), 0.0)
                        + COALESCE(1.0 / (60 + s.sem_rank), 0.0), 6) AS rrf
           FROM lrank l FULL OUTER JOIN srank s ON l.doc_id = s.doc_id)
SELECT doc_id, lex_rank, sem_rank, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
         AS fused_rank
FROM fused
""")
def q_rrf_fusion(spark, sf):
    """Hybrid retrieval: reciprocal-rank fusion (k0=60) of a lexical
    ranking (query-term occurrence count) and a semantic ranking
    (cosine to the vec_id=7 anchor embedding), top-100 candidates per
    side. The lexical score is an exact integer; the cosine follows
    the x5 convention (float64 + 6dp round before ranking)."""
    docs = load(spark, sf, "documents")
    emb = load(spark, sf, "embeddings")
    qt = F.array(*[F.lit(t) for t in ["data", "query", "sort", "merge"]])
    lex = docs.select(
        "doc_id",
        F.size(F.filter(tx.tokens_col("text"),
                        lambda t: F.array_contains(qt, t)))
        .cast("long").alias("lex_score"))
    anchor = emb.filter(F.col("vec_id") == 7).select(
        F.col("embedding").alias("_qv"))
    sem = sim.with_cosine(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(anchor)),
        "_qv", "embedding", out_col="sem_score").select(
        "doc_id", "sem_score")
    return ev.rrf_fuse(lex, sem, n_candidates=100)


@_q("x94_url_canonical", r"""
WITH u AS (SELECT doc_id,
        'HTTPS://WWW.' || upper(source) || '.Example.com/docs/'
        || CAST(doc_id % 40 AS VARCHAR)
        || CASE doc_id % 3
             WHEN 0 THEN '/?utm_source=feed&ref='
                         || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
             WHEN 1 THEN '?ref=' || CAST(doc_id % 7 AS VARCHAR)
                         || '&utm_medium=rss#frag'
             ELSE '/'
           END AS url
      FROM documents),
 c AS (SELECT doc_id,
        lower(regexp_extract(u0, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
          AS scheme,
        regexp_replace(u0, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS rest
       FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u0 FROM u)),
 h AS (SELECT doc_id, scheme,
        regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
                       '^www\.', '') AS host,
        regexp_replace(rest, '^[^/?]*', '') AS pathq
       FROM c),
 p AS (SELECT doc_id, scheme, host,
        regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '')
          AS path,
        regexp_extract(pathq, '\?(.*)$', 1) AS query
       FROM h),
 canon AS (SELECT doc_id,
        scheme || '://' || host || path
        || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical_url
       FROM (SELECT doc_id, scheme, host, path,
                    array_to_string(list_sort(list_filter(
                        string_split(query, '&'),
                        x -> NOT starts_with(x, 'utm_') AND x <> '')), '&')
                      AS qs
             FROM p))
SELECT canonical_url, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_urls
FROM canon GROUP BY 1
""")
def q_url_canonical(spark, sf):
    """Crawl URL canonicalization + dedup: deterministic messy URLs
    synthesized per document (mixed-case scheme/host, www, tracking
    params, fragments, trailing slashes), canonicalized with
    tx.canonical_url, then keep-min-id per canonical form."""
    docs = load(spark, sf, "documents")
    mod3 = F.col("doc_id") % 3
    url = F.concat(
        F.lit("HTTPS://WWW."), F.upper("source"),
        F.lit(".Example.com/docs/"),
        (F.col("doc_id") % 40).cast("string"),
        F.when(mod3 == 0, F.concat(
            F.lit("/?utm_source=feed&ref="),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("&utm_campaign=x")))
        .when(mod3 == 1, F.concat(
            F.lit("?ref="), (F.col("doc_id") % 7).cast("string"),
            F.lit("&utm_medium=rss#frag")))
        .otherwise(F.lit("/")))
    return (docs.select("doc_id", url.alias("url"))
            .select("doc_id", tx.canonical_url("url").alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").cast("long").alias("n_urls")))


@_q("x95_random_projection", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 idx AS (SELECT unnest(generate_series(1, 64)) AS i),
 jj AS (SELECT unnest(generate_series(0, 7)) AS j),
 q AS (SELECT vec_id, i, CAST(floor(v[i] * 1000000.0 + 0.5) AS BIGINT)
              AS qx
       FROM e CROSS JOIN idx),
 s AS (SELECT vec_id, j,
              SUM(qx * (CASE WHEN (((1103515245 * ((i - 1) * 8 + j)
                                     + 12345) % 2147483648)
                                   // 65536) % 2 = 1
                             THEN 1 ELSE -1 END)) AS comp
       FROM q CROSS JOIN jj GROUP BY 1, 2)
SELECT vec_id, CAST(j AS INTEGER) AS dim, CAST(comp AS BIGINT) AS component
FROM s
""")
def q_random_projection(spark, sf):
    """Johnson-Lindenstrauss sign projection 64 -> 8 dims in exact
    fixed-point int64 (sim.random_projection_fixed); the +/-1 matrix
    derives from the same LCG expression in both engines."""
    emb = load(spark, sf, "embeddings")
    return sim.random_projection_fixed(emb, in_dim=64, out_dim=8)


@_q("x96_ks_drift", """
WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
 srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
          GROUP BY 1),
 tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
 cs AS (SELECT source, n_chars AS v, COUNT(*) AS c FROM documents
        GROUP BY 1, 2),
 cg AS (SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1),
 cums AS (SELECT s.source, v.v,
                 SUM(COALESCE(cs.c, 0)) OVER (PARTITION BY s.source
                     ORDER BY v.v) AS cum
          FROM srcs s CROSS JOIN vals v
          LEFT JOIN cs ON cs.source = s.source AND cs.v = v.v),
 cumg AS (SELECT v.v, SUM(COALESCE(cg.c, 0)) OVER (ORDER BY v.v) AS cum
          FROM vals v LEFT JOIN cg ON cg.v = v.v)
SELECT s.source, s.n AS n_docs,
       ROUND(MAX(ABS(cums.cum / s.n - cumg.cum / t.n)), 6) AS ks_stat
FROM cums JOIN srcs s ON cums.source = s.source
     JOIN cumg ON cums.v = cumg.v CROSS JOIN tot t
GROUP BY 1, 2
""")
def q_ks_drift(spark, sf):
    """Per-source KS drift of the n_chars distribution vs the global
    corpus (extensions.profile.ks_drift) — the distribution-shift
    monitor between mixture sources."""
    from data_ingest_spark.extensions.profile import ks_drift
    return ks_drift(load(spark, sf, "documents"),
                    group_col="source", value_col="n_chars")


@_q("x97_doc_keywords", r"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+'))
                       AS token
              FROM documents),
 nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
 tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        GROUP BY 1, 2),
 dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
 s AS (SELECT t.doc_id, t.token, t.tf,
              ROUND(t.tf * ln(nd.n / d.df), 6) AS score
       FROM tf t JOIN dfq d USING (token) CROSS JOIN nd),
 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, token) AS rank FROM s)
SELECT doc_id, token, tf, score, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 3
""")
def q_doc_keywords(spark, sf):
    """Per-document top-3 TF-IDF keywords (tx.doc_keywords) — the
    per-doc sibling of x16's corpus-level TF-IDF."""
    return tx.doc_keywords(load(spark, sf, "documents"), top_k=3)


@_q("x98_temperature_mix", """
WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
             FROM documents GROUP BY 1),
 w AS (SELECT source, n_docs,
              CAST(floor(exp(0.3 * ln(CAST(n_docs AS DOUBLE)))
                         * 1000000.0 + 0.5) AS BIGINT) AS wfp
       FROM per),
 t AS (SELECT SUM(wfp) AS tot FROM w)
SELECT source, n_docs,
       ROUND(wfp / t.tot, 6) AS sample_rate,
       CAST((10000 * wfp) // t.tot AS BIGINT) AS quota
FROM w CROSS JOIN t
""")
def q_temperature_mix(spark, sf):
    """Temperature-scaled source mixing rates (p_s proportional to
    n_s^0.3, fixed-point normalization, exact integer quotas out of a
    10000-doc budget) — extensions.packing.temperature_mix."""
    from data_ingest_spark.extensions.packing import temperature_mix
    return temperature_mix(load(spark, sf, "documents"),
                           alpha=0.3, budget=10000)


@_q("x99_power_pc1", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
 idx AS (SELECT unnest(generate_series(1, 64)) AS i),
 q AS (SELECT vec_id, i, CAST(floor(ev[i] * 1000.0 + 0.5) AS BIGINT) AS qx
       FROM e CROSS JOIN idx),
 st AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM q),
 cs AS (SELECT i, CAST(SUM(qx) AS BIGINT) AS s FROM q GROUP BY 1),
 c AS (SELECT q.vec_id, q.i, q.qx * st.n - cs.s AS cx
       FROM q JOIN cs USING (i) CROSS JOIN st),
 cov AS (SELECT a.i - 1 AS j, b.i - 1 AS k,
                CAST(SUM(a.cx * b.cx) AS BIGINT) // 1000000 AS cjk
         FROM c a JOIN c b ON a.vec_id = b.vec_id
         GROUP BY 1, 2),
 v0 AS (SELECT g.j AS k, CAST(1000 AS BIGINT) AS v
        FROM (SELECT unnest(generate_series(0, 63)) AS j) g),
 u1 AS (SELECT cov.j, SUM(cov.cjk * v0.v) AS u FROM cov
        JOIN v0 ON cov.k = v0.k GROUP BY 1),
 m1 AS (SELECT MAX(ABS(u)) AS m FROM u1),
 v1 AS (SELECT u1.j AS k, CAST((u1.u * 1000) // m1.m AS BIGINT) AS v
        FROM u1 CROSS JOIN m1),
 u2 AS (SELECT cov.j, SUM(cov.cjk * v1.v) AS u FROM cov
        JOIN v1 ON cov.k = v1.k GROUP BY 1),
 m2 AS (SELECT MAX(ABS(u)) AS m FROM u2),
 v2 AS (SELECT u2.j AS k, CAST((u2.u * 1000) // m2.m AS BIGINT) AS v
        FROM u2 CROSS JOIN m2),
 u3 AS (SELECT cov.j, SUM(cov.cjk * v2.v) AS u FROM cov
        JOIN v2 ON cov.k = v2.k GROUP BY 1),
 m3 AS (SELECT MAX(ABS(u)) AS m FROM u3),
 v3 AS (SELECT u3.j AS k, CAST((u3.u * 1000) // m3.m AS BIGINT) AS v
        FROM u3 CROSS JOIN m3),
 sgn AS (SELECT CASE WHEN (SELECT v FROM v3 WHERE v <> 0
                           ORDER BY k LIMIT 1) < 0
                     THEN -1 ELSE 1 END AS s)
SELECT v3.k AS dim, CAST(v3.v * sgn.s AS BIGINT) AS component
FROM v3 CROSS JOIN sgn
""")
def q_power_pc1(spark, sf):
    """Top principal component of the embedding covariance via 3
    unrolled fixed-point power iterations (sim.power_iteration_pc1)
    — the M8 eigen kernel under a full value oracle: quantization,
    centering, covariance, matvec, renormalization and sign fix are
    all exact integer arithmetic in both engines (integer division
    truncates toward zero identically in Spark `div` and DuckDB
    `//`)."""
    emb = load(spark, sf, "embeddings")
    return sim.power_iteration_pc1(emb, dim=64, n_iters=3)


@_q("x100_ivf_incremental", """
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                    AS qe
           FROM embeddings),
c AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id < 4),
d AS (SELECT q.vec_id, c.cid, q.qe,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> (q.qe[i] - c.ce[i]) * (q.qe[i] - c.ce[i])))
                  AS BIGINT) AS d2
      FROM q CROSS JOIN c),
a AS (SELECT vec_id, cid, qe FROM (
        SELECT vec_id, cid, qe,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM d) WHERE rk = 1),
x AS (SELECT cid, CAST(t.i AS INT) AS dim, qe[t.i] AS val
      FROM a CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) t)
SELECT cid, dim, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(val) AS BIGINT) AS sum_q
FROM x GROUP BY 1, 2
""")
def q_ivf_incremental(spark, sf):
    """Incremental ANN-index maintenance (the e26 merge ≡ recompute
    pattern applied to the IVF coarse quantizer): the corpus splits
    into history (vec_id < 250) and a new batch, each side computes
    its mergeable cell state against the SAME seed centroids, and the
    merged state must equal the oracle's full-corpus recompute —
    proving a nightly vector-index refresh can process only the new
    batch."""
    emb = load(spark, sf, "embeddings")
    cents = sim.ivf_seed_centroids(emb, k=4)
    hist = sim.ivf_assign_state(emb.filter(F.col("vec_id") < 250), cents)
    batch = sim.ivf_assign_state(emb.filter(F.col("vec_id") >= 250), cents)
    return sim.merge_ivf_state(hist, batch)


@_q("x101_skew_profile", """
WITH counts AS (SELECT l_partkey AS key, COUNT(*) AS cnt
                FROM lineitem GROUP BY 1),
 tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                CAST(COUNT(*) AS BIGINT) AS nk FROM counts),
 top AS (SELECT key, cnt FROM counts ORDER BY cnt DESC, key LIMIT 5)
SELECT top.key, CAST(top.cnt AS BIGINT) AS cnt,
       ROUND(top.cnt / t.total, 6) AS share,
       ROUND(top.cnt * t.nk / t.total, 6) AS skew_factor,
       CAST((top.cnt * t.nk) // t.total + 1 AS BIGINT) AS salt_hint
FROM top CROSS JOIN tot t
""")
def q_skew_profile(spark, sf):
    """Shuffle-key skew diagnostic over lineitem's part key: heaviest
    5 keys, their share, skew factor vs the mean key, and the salt
    count that flattens them (functions.partitioning.skew_profile) —
    the planning analysis run before salted_join/salted_agg."""
    from data_ingest_spark.functions.partitioning import skew_profile
    return skew_profile(load(spark, sf, "lineitem"), "l_partkey")


@_q("x102_winsorize", """
WITH q AS (SELECT event_type,
                  ROUND(quantile_cont(value, 0.05), 6) AS q_lo,
                  ROUND(quantile_cont(value, 0.95), 6) AS q_hi
           FROM events GROUP BY 1)
SELECT e.event_type, q.q_lo, q.q_hi,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN e.value < q.q_lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below,
       CAST(SUM(CASE WHEN e.value > q.q_hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       CAST(SUM(CAST(floor(least(greatest(e.value, q.q_lo), q.q_hi)
                           * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_clipped_fp
FROM events e JOIN q USING (event_type)
GROUP BY 1, 2, 3
""")
def q_winsorize(spark, sf):
    """Per-event-type winsorization audit (p05/p95 exact interpolated
    clip bounds rounded before use; integer clip counts; fixed-point
    clipped sum) — extensions.profile.winsorize_stats."""
    from data_ingest_spark.extensions.profile import winsorize_stats
    return winsorize_stats(events_df(spark, sf))


@_q("x103_pmi_collocations", r"""
WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 uni AS (SELECT u.w, CAST(COUNT(*) AS BIGINT) AS cw
         FROM (SELECT unnest(t) AS w FROM tk) u GROUP BY 1),
 ntok AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM uni),
 bg AS (SELECT unnest([{'w1': t[i], 'w2': t[i+1]}
                       FOR i IN generate_series(1, len(t) - 1)],
                      recursive := true)
        FROM tk WHERE len(t) >= 2),
 counts AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
            FROM bg GROUP BY 1, 2),
 nbg AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS n FROM counts),
 top AS (SELECT w1, w2, pair_count FROM counts WHERE pair_count >= 5
         ORDER BY pair_count DESC, w1, w2 LIMIT 50)
SELECT top.w1, top.w2, top.pair_count,
       ROUND(ln(CAST(top.pair_count AS DOUBLE) * CAST(ntok.n AS DOUBLE)
                * CAST(ntok.n AS DOUBLE)
                / (CAST(nbg.n AS DOUBLE) * CAST(a.cw AS DOUBLE)
                   * CAST(b.cw AS DOUBLE))), 6) AS pmi
FROM top JOIN uni a ON a.w = top.w1
         JOIN uni b ON b.w = top.w2
         CROSS JOIN ntok CROSS JOIN nbg
""")
def q_pmi_collocations(spark, sf):
    """Top-50 adjacent-bigram collocations by count with exact-ratio
    PMI (tx.pmi_collocations) — phrase discovery for tokenizer
    multi-word entries."""
    return tx.pmi_collocations(load(spark, sf, "documents"),
                               top_k=50, min_count=5)


@_q("x104_temporal_split", """
WITH s AS (SELECT event_type, user_id,
                  CASE WHEN ts >= TIMESTAMP '2024-01-24 00:00:00'
                         THEN 'test'
                       WHEN ts >= TIMESTAMP '2024-01-24 00:00:00'
                                  - INTERVAL 86400 SECOND
                         THEN 'embargo'
                       ELSE 'train' END AS split,
                  ts
           FROM events)
SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM s GROUP BY 1, 2
""")
def q_temporal_split(spark, sf):
    """Train/embargo/test temporal split (cutoff Jan 24, 1-day embargo
    gap — the autocorrelation leakage guard) summarized per split and
    event type; extensions.sampling.temporal_split assigns the split
    column at scan speed."""
    from data_ingest_spark.extensions.sampling import temporal_split
    ev = temporal_split(events_df(spark, sf), "2024-01-24 00:00:00",
                        embargo_s=86400)
    return ev.groupBy("split", "event_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))


@_q("x105_profile_drift", """
WITH b AS (SELECT doc_id,
                  CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END AS lang,
                  source, n_chars + 5 AS n_chars
           FROM documents WHERE doc_id % 7 <> 0),
 pa AS (
   SELECT 'doc_id' AS col, CAST(COUNT(*) AS BIGINT) nr,
          CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) nn,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) nd,
          CAST(MIN(doc_id) AS VARCHAR) mn, CAST(MAX(doc_id) AS VARCHAR) mx
   FROM documents
   UNION ALL
   SELECT 'lang', COUNT(*),
          CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(COUNT(DISTINCT lang) AS BIGINT), MIN(lang), MAX(lang)
   FROM documents
   UNION ALL
   SELECT 'n_chars', COUNT(*),
          CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(COUNT(DISTINCT n_chars) AS BIGINT),
          CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
   FROM documents),
 pb AS (
   SELECT 'doc_id' AS col, CAST(COUNT(*) AS BIGINT) nr,
          CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) nn,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) nd,
          CAST(MIN(doc_id) AS VARCHAR) mn, CAST(MAX(doc_id) AS VARCHAR) mx
   FROM b
   UNION ALL
   SELECT 'lang', COUNT(*),
          CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(COUNT(DISTINCT lang) AS BIGINT), MIN(lang), MAX(lang)
   FROM b
   UNION ALL
   SELECT 'n_chars', COUNT(*),
          CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          CAST(COUNT(DISTINCT n_chars) AS BIGINT),
          CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
   FROM b)
SELECT pa.col AS column, CAST(pb.nr - pa.nr AS BIGINT) AS n_rows_delta,
       CAST(pb.nn - pa.nn AS BIGINT) AS n_nulls_delta,
       CAST(pb.nd - pa.nd AS BIGINT) AS n_distinct_delta,
       pa.mn IS DISTINCT FROM pb.mn AS min_changed,
       pa.mx IS DISTINCT FROM pb.mx AS max_changed
FROM pa JOIN pb ON pa.col = pb.col
""")
def q_profile_drift(spark, sf):
    """Snapshot profile drift (extensions.profile.profile_drift): the
    incoming snapshot drops every 7th doc, nulls lang on doc_id%11=0
    and shifts n_chars by +5 — the drift report must flag the row
    drop, the null spike, and the range shift per column."""
    from data_ingest_spark.extensions.profile import profile_drift
    a = load(spark, sf, "documents")
    b = (a.filter(F.col("doc_id") % 7 != 0)
         .select("doc_id",
                 F.when(F.col("doc_id") % 11 == 0, None)
                 .otherwise(F.col("lang")).alias("lang"),
                 "source",
                 (F.col("n_chars") + 5).alias("n_chars")))
    return profile_drift(a, b, cols=["doc_id", "lang", "n_chars"])


@_q("x106_weighted_sample", """
WITH h AS (
  SELECT source, doc_id, n_chars,
         (CAST(CAST(concat('0x', substr(md5('29:' ||
              CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 10000 + 1
           AS DOUBLE) / 10000.0) / CAST(n_chars AS DOUBLE) AS pri
  FROM documents),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY pri ASC, doc_id ASC) AS INT)
           AS rank
       FROM h)
SELECT source, doc_id, n_chars, rank, ROUND(pri, 9) AS priority
FROM r WHERE rank <= 25
""")
def q_weighted_sample(spark, sf):
    """Sequential Poisson sampling (Ohlsson πps family): per source,
    the 25 docs with the smallest u/w priority — weighted sampling
    WITHOUT replacement, inclusion odds rising with n_chars. The
    priority is a ratio of exact integers ((bucket+1)/10000 over the
    weight), i.e. two IEEE correctly-rounded divisions, so the order
    is bit-identical across engines — no transcendentals in the key."""
    from data_ingest_spark.extensions.sampling import weighted_sample
    docs = load(spark, sf, "documents")
    return (weighted_sample(docs, "n_chars", 25, id_col="doc_id",
                            by="source", seed=29)
            .select("source", "doc_id", "n_chars", "rank", "priority"))


@_q("x107_wilson_winrate", """
WITH a AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS wins,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS losses
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY user_id),
 s AS (
  SELECT user_id, wins, losses, CAST(wins + losses AS BIGINT) AS n,
         ROUND(CAST(wins AS DOUBLE) / CAST(wins + losses AS DOUBLE), 6)
           AS win_rate,
         ROUND((CAST(wins AS DOUBLE) / CAST(wins + losses AS DOUBLE)
                + (1.96 * 1.96) / (2.0 * CAST(wins + losses AS DOUBLE))
                - 1.96 * sqrt((CAST(wins AS DOUBLE)
                                 / CAST(wins + losses AS DOUBLE)
                               * (1.0 - CAST(wins AS DOUBLE)
                                   / CAST(wins + losses AS DOUBLE))
                               + (1.96 * 1.96)
                                 / (4.0 * CAST(wins + losses AS DOUBLE)))
                              / CAST(wins + losses AS DOUBLE)))
               / (1.0 + (1.96 * 1.96) / CAST(wins + losses AS DOUBLE)), 6)
           AS wilson_lcb
  FROM a WHERE wins + losses > 0),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (
           ORDER BY wilson_lcb DESC, user_id ASC) AS INT) AS rank
       FROM s)
SELECT user_id, wins, losses, n, win_rate, wilson_lcb, rank
FROM r WHERE rank <= 50
""")
def q_wilson_winrate(spark, sf):
    """Wilson lower-confidence-bound win-rate ranking over binary
    preference outcomes (purchase = win, click = loss per user) — the
    small-sample guard that stops a 2/2 item outranking a 90/100 one.
    Top 50 by (LCB desc, id); the global rank is the bucketed two-pass
    (no unpartitioned window), the LCB is rounded to 6dp before the
    cut per the repo's m12/m9 convention."""
    from data_ingest_spark.extensions.evaluation import wilson_winrate
    return (wilson_winrate(events_df(spark, sf), group_col="user_id",
                           outcome_col="event_type",
                           win_value="purchase", loss_value="click",
                           z=1.96, top_k=50)
            .select("user_id", "wins", "losses", "n", "win_rate",
                    "wilson_lcb", "rank"))


@_q("x108_hist_merge", """
WITH binned AS (
  SELECT CAST(LEAST(13, GREATEST(0, FLOOR((value - 0.0) / 25.0)))
              AS BIGINT) AS bin,
         event_id
  FROM events WHERE value IS NOT NULL),
 h AS (SELECT bin,
              SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
              SUM(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS nb,
              COUNT(*) AS nd
       FROM binned GROUP BY bin)
SELECT bin, ROUND(0.0 + bin * 25.0, 6) AS lo_edge,
       ROUND(0.0 + (bin + 1) * 25.0, 6) AS hi_edge,
       CAST(na + nb AS BIGINT) AS n_merged,
       CAST(nd AS BIGINT) AS n_direct,
       (na + nb) = nd AS consistent
FROM h
""")
def q_hist_merge(spark, sf):
    """Mergeable equi-width histogram with a merge ≡ recompute audit
    (the e26/x100 pattern): build independent histogram states on the
    even- and odd-event_id halves of the corpus, merge by summing bin
    counts, and join against the direct single-pass build. At 100 TB
    each ingest batch ships its ≤ nbins-row state and the refresh is a
    tiny reduce instead of a full rescan."""
    from data_ingest_spark.extensions.sketches import (equi_width_hist,
                                                       merge_hists)
    ev = events_df(spark, sf)
    a = equi_width_hist(ev.filter(F.col("event_id") % 2 == 0),
                        "value", 0.0, 350.0, 14)
    b = equi_width_hist(ev.filter(F.col("event_id") % 2 != 0),
                        "value", 0.0, 350.0, 14)
    merged = merge_hists(a, b).withColumnRenamed("n", "n_merged")
    direct = equi_width_hist(ev, "value", 0.0, 350.0, 14) \
        .withColumnRenamed("n", "n_direct")
    return (merged.join(direct, "bin", "full")
            .select("bin",
                    F.round(F.lit(0.0) + F.col("bin") * 25.0, 6)
                    .alias("lo_edge"),
                    F.round(F.lit(0.0) + (F.col("bin") + 1) * 25.0, 6)
                    .alias("hi_edge"),
                    F.coalesce("n_merged", F.lit(0)).cast("long")
                    .alias("n_merged"),
                    F.coalesce("n_direct", F.lit(0)).cast("long")
                    .alias("n_direct"),
                    (F.coalesce("n_merged", F.lit(0))
                     == F.coalesce("n_direct", F.lit(0)))
                    .alias("consistent")))


@_q("x110_quantile_norm", """
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
 s AS (SELECT doc_id, source, n_chars,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS src_rank,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
       FROM d),
 g AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
              AS BIGINT) AS gpos,
              CAST(n_chars AS BIGINT) AS gval
       FROM d),
 p AS (SELECT doc_id, source, n_chars, src_rank,
              ((2 * src_rank - 1) * (SELECT COUNT(*) FROM d)
               + 2 * ns - 1) // (2 * ns) AS gp
       FROM s)
SELECT p.doc_id, p.source, p.n_chars, p.src_rank,
       g.gval AS norm_value
FROM p JOIN g ON g.gpos = p.gp
""")
def q_quantile_norm(spark, sf):
    """Cross-source quantile normalization of document lengths: each
    doc's n_chars is replaced by the corpus-wide value at its
    within-source mid-rank quantile, aligning every source's length
    distribution before mixing — integer-exact rank arithmetic, the
    bucketed two-pass global rank, one position equi-join."""
    from data_ingest_spark.extensions.profile import quantile_normalize
    return quantile_normalize(load(spark, sf, "documents"),
                              value_col="n_chars", group_col="source",
                              id_col="doc_id")


@_q("x111_skipgram_pairs", r"""
WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 pr AS (
   SELECT unnest([{'w1': t[i], 'w2': t[i+1], 'wt': 3}
                  FOR i IN generate_series(1, len(t) - 1)],
                 recursive := true)
   FROM tk WHERE len(t) >= 2
   UNION ALL
   SELECT unnest([{'w1': t[i], 'w2': t[i+2], 'wt': 2}
                  FOR i IN generate_series(1, len(t) - 2)],
                 recursive := true)
   FROM tk WHERE len(t) >= 3
   UNION ALL
   SELECT unnest([{'w1': t[i], 'w2': t[i+3], 'wt': 1}
                  FOR i IN generate_series(1, len(t) - 3)],
                 recursive := true)
   FROM tk WHERE len(t) >= 4),
 c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count,
              CAST(SUM(wt) AS BIGINT) AS w_sum
       FROM pr GROUP BY 1, 2)
SELECT w1, w2, pair_count, w_sum FROM c
WHERE pair_count >= 5 ORDER BY pair_count DESC, w1, w2 LIMIT 50
""")
def q_skipgram_pairs(spark, sf):
    """Window-3 skip-gram co-occurrence counts with exact integer
    proximity weights (tx.skipgram_pairs) — the word2vec/GloVe
    training statistic; x103's PMI is the adjacent-only special
    case. The oracle unrolls the three fixed offsets with unbounded
    position comprehensions (the x47 form — no length cap)."""
    return tx.skipgram_pairs(load(spark, sf, "documents"),
                             window=3, top_k=50, min_count=5)


_X112_COLS = [("o_orderkey", None), ("o_custkey", None),
              ("o_orderstatus", "^[FO]$"), ("o_totalprice", None),
              ("o_orderdate", None),
              ("o_orderpriority", "^[1-5]-[A-Z ]+$")]


def _x112_sql() -> str:
    parts = []
    for c, rx in _X112_COLS:
        m = (f"ROUND(SUM(CASE WHEN regexp_matches(CAST({c} AS VARCHAR), "
             f"'{rx}') THEN 1 ELSE 0 END) / COUNT(*), 9)"
             if rx else "CAST(NULL AS DOUBLE)")
        parts.append(f"""
SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       ROUND(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) / COUNT(*), 9)
         AS null_frac,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_value,
       MAX(CAST({c} AS VARCHAR)) AS max_value,
       {m} AS regex_match_frac
FROM orders""")
    return "\nUNION ALL".join(parts)


@_q("x112_column_expectations", _x112_sql())
def q_column_expectations(spark, sf):
    """Per-column ingest-gate expectations over orders
    (profile.column_expectations): null fractions, exact distincts,
    VARCHAR min/max, and regex match rates for the enum-shaped
    columns — the batch-acceptance report computed in ONE scan."""
    from data_ingest_spark.extensions.profile import column_expectations
    return column_expectations(
        load(spark, sf, "orders"), [c for c, _ in _X112_COLS],
        regex_rules={c: rx for c, rx in _X112_COLS if rx})


@_q("x113_paragraph_dedup", rf"""
WITH corpus AS ({_NEARDUP_SQL}),
 base AS (SELECT doc_id, string_split_regex(text, '\. ') AS ps
          FROM corpus),
 prow AS (SELECT doc_id,
                 unnest([{{'pos': i - 1, 'para': ps[i]}}
                         FOR i IN generate_series(1, len(ps))],
                        recursive := true)
          FROM base),
 rk AS (SELECT doc_id, pos, para,
               ROW_NUMBER() OVER (PARTITION BY md5(para)
                                  ORDER BY doc_id, pos) AS rk
        FROM prow),
 kept AS (SELECT doc_id, pos, para FROM rk WHERE rk = 1),
 tot AS (SELECT doc_id, len(ps) AS tot FROM base),
 agg AS (SELECT doc_id,
                string_agg(para, '. ' ORDER BY pos) AS clean_text,
                COUNT(*) AS nk
         FROM kept GROUP BY 1)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.tot - COALESCE(a.nk, 0) AS BIGINT) AS n_dropped
FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
""")
def q_paragraph_dedup(spark, sf):
    """Corpus-global exact paragraph dedup with first-occurrence
    survivorship (dd.paragraph_dedup — the CCNet paragraph pass) on
    the planted near-dup corpus: every paragraph the head-truncated
    mirrors share with their originals survives only in the original
    (smallest doc id), so the mirrors shrink and the originals pass
    through intact."""
    return dd.paragraph_dedup(_neardup_corpus(spark, sf))


@_q("x114_mrr_jackknife", """
WITH ranked AS (
  SELECT user_id, event_id, value, (event_type = 'purchase') AS relevant,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events),
 per AS (SELECT user_id, MIN(CASE WHEN relevant THEN rk END) AS frr
         FROM ranked GROUP BY 1),
 rr AS (SELECT CASE WHEN frr IS NOT NULL AND frr <= 10
                    THEN 2520 // frr ELSE 0 END AS rr_fp FROM per),
 t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(rr_fp) AS BIGINT) AS s FROM rr),
 q AS (SELECT CAST(SUM((t.s - t.n * rr.rr_fp)
                       * (t.s - t.n * rr.rr_fp)) AS BIGINT) AS qq,
              ANY_VALUE(t.n) AS n, ANY_VALUE(t.s) AS s
       FROM rr, t),
 u AS (SELECT n AS n_queries,
              CAST(s AS DOUBLE) / (n * 2520) AS mrr_d,
              CASE WHEN n > 1 THEN
                sqrt(CAST(qq AS DOUBLE) * (n - 1) / n)
                / (CAST(n AS DOUBLE) * (n - 1) * 2520)
              ELSE 0.0 END AS se_d
       FROM q)
SELECT n_queries, ROUND(mrr_d, 9) AS mrr, ROUND(se_d, 9) AS se_jack,
       ROUND(mrr_d - 1.96 * se_d, 9) AS ci_lo,
       ROUND(mrr_d + 1.96 * se_d, 9) AS ci_hi
FROM u
""")
def q_mrr_jackknife(spark, sf):
    """MRR@10 with a leave-one-query-out jackknife standard error and
    95% CI (ev.mrr_jackknife) — fixed-point reciprocal ranks make the
    MRR numerator and the jackknife spread exact int64, so the CI is
    hash-exact cross-engine up to one shared sqrt."""
    evdf = events_df(spark, sf).withColumn(
        "relevant", F.col("event_type") == F.lit("purchase"))
    return ev.mrr_jackknife(evdf, k=10)


@_q("x115_class_report", """
WITH pairs AS (
  SELECT event_type AS gold,
         CASE WHEN event_id % 7 < 5 THEN event_type ELSE 'view' END AS pred
  FROM events),
 cm AS (SELECT gold, pred, CAST(COUNT(*) AS BIGINT) AS c
        FROM pairs GROUP BY 1, 2),
 g AS (SELECT gold AS label, CAST(SUM(c) AS BIGINT) AS n_gold
       FROM cm GROUP BY 1),
 p AS (SELECT pred AS label, CAST(SUM(c) AS BIGINT) AS n_pred
       FROM cm GROUP BY 1),
 tp AS (SELECT gold AS label, c AS tp FROM cm WHERE gold = pred),
 rep AS (SELECT COALESCE(g.label, p.label) AS label,
                COALESCE(g.n_gold, 0) AS n_gold,
                COALESCE(p.n_pred, 0) AS n_pred
         FROM g FULL JOIN p ON g.label = p.label)
SELECT rep.label, rep.n_gold, rep.n_pred,
       CAST(COALESCE(tp.tp, 0) AS BIGINT) AS tp,
       ROUND(CASE WHEN rep.n_pred > 0
                  THEN COALESCE(tp.tp, 0) / rep.n_pred ELSE 0.0 END, 9)
         AS precision,
       ROUND(CASE WHEN rep.n_gold > 0
                  THEN COALESCE(tp.tp, 0) / rep.n_gold ELSE 0.0 END, 9)
         AS recall,
       ROUND(CASE WHEN rep.n_gold + rep.n_pred > 0
                  THEN 2 * COALESCE(tp.tp, 0) / (rep.n_gold + rep.n_pred)
                  ELSE 0.0 END, 9) AS f1
FROM rep LEFT JOIN tp ON rep.label = tp.label
""")
def q_class_report(spark, sf):
    """Per-class precision/recall/F1/support (ev.classification_report)
    from a synthetic deterministic classifier over events (predicts
    the true type 5/7 of the time, 'view' otherwise): exact-count
    ratios, F1 via 2·tp/(n_gold+n_pred) — no float feeds a float."""
    pairs = events_df(spark, sf).select(
        F.col("event_type").alias("gold"),
        F.when(F.col("event_id") % 7 < 5, F.col("event_type"))
        .otherwise(F.lit("view")).alias("pred"))
    return ev.classification_report(pairs)


def _kcenter_sql(k: int = 8) -> str:
    """Unrolled k-center greedy oracle (the x51/x83/m13 fixed-
    iteration trick): per round, MIN squared quantized distance to the
    selected set, then argmax with the (dmin DESC, vec_id ASC)
    tie-break. MATERIALIZED hints keep DuckDB from re-inlining the
    round CTEs exponentially (the m13 sf0.1 lesson)."""
    d2 = ("CAST(list_sum(list_transform(range(1, 65), "
          "i -> (q.qe[i] - s.qe[i]) * (q.qe[i] - s.qe[i]))) AS BIGINT)")
    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe"
        " FROM embeddings)",
        " sel0 AS MATERIALIZED (SELECT 0 AS sel_order, vec_id,"
        " CAST(0 AS BIGINT) AS radius2, qe FROM q"
        " ORDER BY vec_id ASC LIMIT 1)",
    ]
    for r in range(1, k):
        parts.append(
            f" s{r} AS MATERIALIZED (SELECT q.vec_id, MIN({d2}) AS dmin"
            f" FROM q CROSS JOIN sel{r - 1} s GROUP BY q.vec_id)")
        parts.append(
            f" c{r} AS MATERIALIZED (SELECT {r} AS sel_order, s.vec_id,"
            f" CAST(s.dmin AS BIGINT) AS radius2, q.qe"
            f" FROM s{r} s JOIN q ON q.vec_id = s.vec_id"
            f" ORDER BY s.dmin DESC, s.vec_id ASC LIMIT 1)")
        parts.append(
            f" sel{r} AS MATERIALIZED (SELECT * FROM sel{r - 1}"
            f" UNION ALL SELECT * FROM c{r})")
    return (",".join(parts)
            + f" SELECT sel_order, vec_id, radius2 FROM sel{k - 1}")


@_q("x109_kcenter_coreset", _kcenter_sql(8))
def q_kcenter_coreset(spark, sf):
    """Greedy k-center diversity coreset (Gonzalez farthest-point
    traversal, k=8) over the embeddings table in exact fixed-point
    arithmetic — selection order, chosen ids, and the per-round
    max-min radius certificate all hash-match the 8-round unrolled
    SQL oracle."""
    from data_ingest_spark.extensions.similarity import kcenter_greedy
    return kcenter_greedy(load(spark, sf, "embeddings"), k=8)


@_q("x116_auc_rank", """
WITH c AS (SELECT value AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS BIGINT) AS pos
           FROM events WHERE value IS NOT NULL GROUP BY 1),
 w AS (SELECT s, cnt, pos,
              COALESCE(SUM(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                       PRECEDING AND 1 PRECEDING), 0) AS below
       FROM c),
 t AS (SELECT CAST(SUM(pos) AS HUGEINT) AS np,
              CAST(SUM(cnt - pos) AS HUGEINT) AS nn,
              SUM(CAST(pos AS HUGEINT)
                  * CAST(2 * below + cnt + 1 AS HUGEINT)) AS r2,
              CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_tie_groups
       FROM w),
 a AS (SELECT np, nn, n_tie_groups,
              CASE WHEN np > 0 AND nn > 0 THEN
                CAST(r2 - np * (np + 1) AS DOUBLE)
                / CAST(2 * np * nn AS DOUBLE)
              ELSE 0.0 END AS auc_d
       FROM t)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       n_tie_groups, ROUND(auc_d, 9) AS auc,
       ROUND(2 * auc_d - 1, 9) AS gini
FROM a
""")
def q_auc_rank(spark, sf):
    """Exact ROC-AUC over events (label = purchase, score = value) via
    the Mann-Whitney midrank identity (ev.auc_rank): every sum up to
    the single final division is integer (2x midranks are whole;
    DECIMAL(38,0) accumulators mirror DuckDB's HUGEINT), so the AUC
    and Gini hash-match the oracle exactly."""
    evdf = events_df(spark, sf).select(
        (F.col("event_type") == "purchase").alias("label"),
        F.col("value").alias("score"))
    return ev.auc_rank(evdf)


@_q("x117_calibration", """
WITH b AS (SELECT LEAST(CAST(FLOOR(((event_id % 1000) / 1000.0) * 10)
                        AS INT), 9) AS bin,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS lab,
                  CAST(ROUND(((event_id % 1000) / 1000.0) * 1000000)
                       AS BIGINT) AS pfp
           FROM events),
 g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(lab) AS BIGINT) AS n_pos,
              CAST(SUM(pfp) AS HUGEINT) AS sp
       FROM b GROUP BY 1)
SELECT bin, n, n_pos,
       ROUND(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 9)
         AS mean_p,
       ROUND(n_pos / n, 9) AS frac_pos,
       ROUND(ABS(CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                 - n_pos / n), 9) AS gap
FROM g ORDER BY bin
""")
def q_calibration(spark, sf):
    """Reliability-diagram bins (ev.calibration_bins) for a synthetic
    deterministic predictor p = (event_id % 1000)/1000 against the
    purchase label: per-bin exact mean prediction (fixed-point sum /
    count) vs exact empirical positive rate."""
    evdf = events_df(spark, sf).select(
        (F.col("event_type") == "purchase").alias("label"),
        ((F.col("event_id") % 1000) / 1000.0).alias("p"))
    return ev.calibration_bins(evdf, bins=10)


@_q("x118_cohens_kappa", """
WITH pairs AS (
  SELECT event_type AS a,
         CASE WHEN event_id % 5 < 3 THEN event_type
              ELSE CASE event_id % 3 WHEN 0 THEN 'click'
                   WHEN 1 THEN 'view' ELSE 'purchase' END END AS b
  FROM events),
 cm AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM pairs GROUP BY 1, 2),
 ra AS (SELECT a AS l, CAST(SUM(c) AS HUGEINT) AS ra FROM cm GROUP BY 1),
 rb AS (SELECT b AS l, CAST(SUM(c) AS HUGEINT) AS rb FROM cm GROUP BY 1),
 pe AS (SELECT CAST(SUM(COALESCE(ra.ra, 0) * COALESCE(rb.rb, 0))
                    AS HUGEINT) AS sumrc,
               CAST(COUNT(*) AS BIGINT) AS n_labels
        FROM ra FULL JOIN rb ON ra.l = rb.l),
 tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n,
                CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS HUGEINT)
                  AS agree
         FROM cm)
SELECT CAST(tot.n AS BIGINT) AS n, CAST(tot.agree AS BIGINT) AS n_agree,
       pe.n_labels,
       ROUND(CASE WHEN (tot.n * tot.n - pe.sumrc) <> 0 THEN
               CAST(tot.n * tot.agree - pe.sumrc AS DOUBLE)
               / CAST(tot.n * tot.n - pe.sumrc AS DOUBLE)
             ELSE 0.0 END, 9) AS kappa
FROM tot, pe
""")
def q_cohens_kappa(spark, sf):
    """Cohen's kappa (ev.cohens_kappa) between the true event_type and
    a synthetic second annotator that agrees 3/5 of the time: the
    (n*agree - SUM r_i*c_i) / (n^2 - SUM r_i*c_i) form is a single
    exact division of DECIMAL(38,0)/HUGEINT integers."""
    evdf = events_df(spark, sf).select(
        F.col("event_type").alias("rater_a"),
        F.when(F.col("event_id") % 5 < 3, F.col("event_type"))
        .otherwise(F.when(F.col("event_id") % 3 == 0, F.lit("click"))
                   .when(F.col("event_id") % 3 == 1, F.lit("view"))
                   .otherwise(F.lit("purchase"))).alias("rater_b"))
    return ev.cohens_kappa(evdf)


@_q("x119_interval_merge", """
WITH iv AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS s,
                   epoch_us(ts::TIMESTAMP)
                   + CAST(ROUND(value * 1000000) AS BIGINT) AS e
            FROM events),
 m AS (SELECT user_id, s, e,
              MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pm
       FROM iv),
 fl AS (SELECT user_id, s, e,
               CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS brk
        FROM m),
 isl AS (SELECT user_id, s, e,
                SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS g
         FROM fl)
SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_merged
FROM isl GROUP BY user_id, g
""")
def q_interval_merge(spark, sf):
    """Per-user span union (cdc.merge_intervals) over activity
    intervals [ts, ts + value seconds] in exact integer microseconds —
    the PII-span / validity-window consolidation primitive, via the
    SCD2 island idiom (running MAX(end) marks breaks)."""
    from data_ingest_spark.extensions.cdc import merge_intervals
    evdf = events_df(spark, sf)
    # ts is TIMESTAMP_NTZ; the session is pinned to UTC so the cast
    # to TIMESTAMP is lossless and matches DuckDB's epoch_us.
    s = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = evdf.select(
        "user_id", s.alias("start"),
        (s + F.round(F.col("value") * 1000000).cast("long")).alias("end"))
    return merge_intervals(iv, key_col="user_id",
                           start_col="start", end_col="end")


@_q("x120_cdc_chunks", """
WITH d AS (SELECT doc_id, text AS t, CAST(length(text) AS INT) AS n
           FROM documents),
 c AS (SELECT doc_id, n,
              CASE WHEN n >= 4 THEN
                list_filter(range(4, CAST(n AS BIGINT) + 1), i ->
                  ((((unicode(t[i-3]) * 31 + unicode(t[i-2])) * 31
                     + unicode(t[i-1])) * 31 + unicode(t[i])) % 64) = 0)
              ELSE [] END AS cuts
       FROM d),
 f AS (SELECT doc_id, n, cuts,
              [CAST(0 AS BIGINT)] || cuts
              || (CASE WHEN COALESCE(cuts[-1], 0) < n OR n = 0
                       THEN [CAST(n AS BIGINT)] ELSE [] END) AS fl
       FROM c),
 l AS (SELECT doc_id, n, cuts,
              list_transform(range(2, CAST(len(fl) AS BIGINT) + 1),
                             i -> fl[CAST(i AS INT)]
                                  - fl[CAST(i AS INT) - 1]) AS lens
       FROM f)
SELECT doc_id, CAST(len(lens) AS BIGINT) AS n_chunks,
       CAST(n AS BIGINT) AS len_chars,
       ROUND(n / len(lens), 9) AS avg_chunk_len,
       CAST(COALESCE(list_max(lens), 0) AS BIGINT) AS max_chunk_len,
       list_reduce(list_prepend(CAST(0 AS BIGINT), cuts),
                   (acc, c) -> (acc * 1000003 + c) % 2147483647)
         AS boundary_hash
FROM l
""")
def q_cdc_chunks(spark, sf):
    """Content-defined chunking stats (tx.cdc_chunk_stats) over
    documents with the Rabin-style 4-char rolling-hash boundary rule
    (hash % 64 == 0): chunk count, exact average length, max length,
    and a positional checksum of the cut list — byte-shift-insensitive
    chunking, the delta-dedup primitive. The oracle covers the
    no-min-size configuration; FastCDC min-size suppression is
    unit-tested against a Python mirror."""
    docs = load(spark, sf, "documents")
    return tx.cdc_chunk_stats(docs, window=4, mask=63, min_chunk=1)


@_q("x121_decontam_spans", """
WITH toks AS (SELECT doc_id,
                     string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
 grams AS (SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_transform(range(0, CAST(len(tk) AS BIGINT) - 2),
                      p -> {'p': p,
                            'g': tk[CAST(p AS INT) + 1] || ' '
                                 || tk[CAST(p AS INT) + 2] || ' '
                                 || tk[CAST(p AS INT) + 3]})
                  ELSE [] END AS gs
           FROM toks),
 bsh AS (SELECT DISTINCT u.g AS g
         FROM grams, UNNEST(gs) AS t(u) WHERE doc_id % 97 = 0),
 pos AS (SELECT doc_id, u.p AS p, u.g AS g
         FROM grams, UNNEST(gs) AS t(u) WHERE doc_id % 97 <> 0),
 mk AS (SELECT pos.doc_id, pos.p,
               CASE WHEN bsh.g IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM pos LEFT JOIN bsh ON pos.g = bsh.g),
 agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_positions,
                CAST(SUM(hit) AS BIGINT) AS n_hits
         FROM mk GROUP BY 1),
 hitrows AS (SELECT doc_id, p FROM mk WHERE hit = 1),
 isl AS (SELECT doc_id, p,
                p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p)
                  AS grp
         FROM hitrows),
 runs AS (SELECT doc_id, COUNT(*) AS run FROM isl GROUP BY doc_id, grp),
 lr AS (SELECT doc_id, CAST(MAX(run) AS BIGINT) AS longest_run
        FROM runs GROUP BY 1),
 fh AS (SELECT doc_id, CAST(MIN(p) AS BIGINT) AS first_hit_pos
        FROM hitrows GROUP BY 1)
SELECT agg.doc_id, agg.n_positions, agg.n_hits, fh.first_hit_pos,
       lr.longest_run
FROM agg JOIN fh USING (doc_id) JOIN lr USING (doc_id)
WHERE agg.n_hits > 0
""")
def q_decontam_spans(spark, sf):
    """Span-level decontamination (tx.decontam_spans): WHERE the
    benchmark n-grams occur inside each corpus document (first hit
    position, longest consecutive matching run), not just whether —
    the excise-the-span variant of x34, same doc_id%97 benchmark
    split, k=3 at test scale (k=13 in production)."""
    docs = load(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return tx.decontam_spans(corpus, bench, k=3)


@_q("x122_theil_sen", """
WITH e AS (SELECT user_id AS k, event_id AS i, epoch(ts) AS t,
                  value AS v FROM events),
 s AS (SELECT a.k, ((b.v - a.v) * 3600.0) / (b.t - a.t) AS sl
       FROM e a JOIN e b ON a.k = b.k AND a.i < b.i AND a.t <> b.t),
 r AS (SELECT k, sl,
              ROW_NUMBER() OVER (PARTITION BY k ORDER BY sl) AS rn,
              COUNT(*) OVER (PARTITION BY k) AS n FROM s)
SELECT k AS user_id, CAST(MAX(n) AS BIGINT) AS n_pairs,
       ROUND(AVG(sl), 6) AS theil_slope
FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
GROUP BY 1
""")
def q_theil_sen(spark, sf):
    """Per-user Theil–Sen robust trend (rg.theil_sen) of event value
    over time, in value-units/hour — the median-of-pairwise-slopes
    estimator; the positional median pick makes the whole iterative-
    free construction value-checkable."""
    return rg.theil_sen(load(spark, sf, "events"))


@_q("x123_good_turing", r"""
WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 sh AS (SELECT CASE WHEN len(t) >= 3 THEN
                 [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                  FOR i IN generate_series(1, len(t) - 2)]
               ELSE [array_to_string(t, ' ')] END AS gs
        FROM tk),
 uni AS (SELECT u.w, CAST(COUNT(*) AS BIGINT) AS cw
         FROM (SELECT unnest(gs) AS w FROM sh) u GROUP BY 1),
 spec AS (SELECT cw AS r, CAST(COUNT(*) AS BIGINT) AS n_r
          FROM uni GROUP BY 1),
 tot AS (SELECT CAST(SUM(cw) AS DOUBLE) AS n FROM uni)
SELECT s.r, s.n_r,
       ROUND(CAST(s.r + 1 AS DOUBLE) * CAST(nx.n_r AS DOUBLE)
             / CAST(s.n_r AS DOUBLE), 6) AS r_star,
       ROUND(CAST(s.r AS DOUBLE) * CAST(s.n_r AS DOUBLE) / tot.n, 6)
         AS mass
FROM spec s LEFT JOIN spec nx ON nx.r = s.r + 1 CROSS JOIN tot
WHERE s.r <= 10
""")
def q_good_turing(spark, sf):
    """Good–Turing frequency spectrum (tx.good_turing_spectrum) over
    word-trigram types: count-of-counts n_r, Turing-adjusted r*, and
    per-class mass; the r=1 mass is the unseen-mass estimate used to
    size a tokenizer vocab before training."""
    return tx.good_turing_spectrum(load(spark, sf, "documents"))


@_q("x124_zipf_fit", r"""
WITH tk AS (SELECT source AS g,
                   string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 uni AS (SELECT g, u.w, CAST(COUNT(*) AS BIGINT) AS cw
         FROM (SELECT g, unnest(t) AS w FROM tk) u GROUP BY 1, 2),
 rk AS (SELECT g, cw,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY cw DESC, w ASC) AS r
        FROM uni),
 pts AS (SELECT g, ln(CAST(r AS DOUBLE)) AS x,
                ln(CAST(cw AS DOUBLE)) AS y
         FROM rk WHERE r <= 100),
 fit AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx,
                SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
         FROM pts GROUP BY 1)
SELECT g AS source, CAST(n AS BIGINT) AS n_ranked,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
         AS zipf_slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS zipf_intercept
FROM fit
""")
def q_zipf_fit(spark, sf):
    """Per-source Zipf exponent (tx.zipf_fit): OLS of ln(count) ~
    ln(rank) over each source's top-100 tokens — a one-number
    distribution fingerprint that flags template/boilerplate-heavy
    sources before they skew a training mix."""
    return tx.zipf_fit(load(spark, sf, "documents"))


@_q("x125_entity_resolution", r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text
            FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id + 2000000, text || ' ' || lang
            FROM documents WHERE doc_id % 7 = 0),
 tk AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
        FROM corpus),
 keyed AS (SELECT doc_id, concat_ws(' ', t[1], t[2]) AS blk, t FROM tk),
 bok AS (SELECT blk FROM keyed GROUP BY 1 HAVING COUNT(*) <= 50),
 kb AS (SELECT keyed.doc_id, keyed.blk, keyed.t
        FROM keyed JOIN bok USING (blk)),
 sh AS (SELECT DISTINCT doc_id, u.s AS shingle
        FROM kb, UNNEST(CASE WHEN len(t) >= 3 THEN
                          [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                           FOR i IN generate_series(1, len(t) - 2)]
                        ELSE [array_to_string(t, ' ')] END) AS u(s)),
 sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
 cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM kb a JOIN kb b ON a.blk = b.blk AND a.doc_id < b.doc_id),
 inter AS (SELECT c.ia, c.ib, COUNT(*) AS i
           FROM cand c JOIN sh x ON x.doc_id = c.ia
                       JOIN sh y ON y.doc_id = c.ib
                                AND y.shingle = x.shingle
           GROUP BY 1, 2),
 edges AS (SELECT i.ia, i.ib
           FROM inter i JOIN sizes na ON na.doc_id = i.ia
                        JOIN sizes nb ON nb.doc_id = i.ib
           WHERE i.i / (na.n + nb.n - i.i) >= 0.6),
 und AS (SELECT ia AS src, ib AS dst FROM edges
         UNION SELECT ib, ia FROM edges),
 nodes AS (SELECT DISTINCT src AS id FROM und),
 walk AS (
   WITH RECURSIVE reach(src, dst) AS (
     SELECT id, id FROM nodes
     UNION
     SELECT r.src, e.dst FROM reach r JOIN und e ON r.dst = e.src)
   SELECT src, MIN(dst) AS lbl FROM reach GROUP BY 1),
 ent AS (SELECT c.doc_id, COALESCE(w.lbl, c.doc_id) AS entity_id
         FROM corpus c LEFT JOIN walk w ON w.src = c.doc_id),
 sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM ent GROUP BY 1)
SELECT ent.doc_id, ent.entity_id, sz.n_members
FROM ent JOIN sz USING (entity_id)
""")
def q_entity_resolution(spark, sf):
    """End-to-end entity resolution (dd.resolve_entities) over a
    three-source corpus — originals, exact republications (+1e6,
    doc_id%10=0), and fuzzy variants with one appended token (+2e6,
    doc_id%7=0): first-2-token blocking with a superblock cap, exact
    trigram-shingle Jaccard >= 0.6, then connected components so
    transitive matches share one entity; the oracle recomputes the
    closure with a recursive CTE."""
    docs = load(spark, sf, "documents")
    corpus = (docs.select("doc_id", "text")
              .unionByName(docs.filter(F.col("doc_id") % 10 == 0)
                           .select((F.col("doc_id") + 1000000)
                                   .alias("doc_id"), "text"))
              .unionByName(docs.filter(F.col("doc_id") % 7 == 0)
                           .select((F.col("doc_id") + 2000000)
                                   .alias("doc_id"),
                                   F.concat_ws(" ", "text", "lang")
                                   .alias("text"))))
    return dd.resolve_entities(corpus)


def _phash_core_sql() -> str:
    """Shared x126/x127 oracle core: the full pHash pipeline in SQL
    ending in a ``ph(doc_id, phash, n_above)`` CTE, sharing the exact
    fixed-point DCT basis with the Spark kernel (multimodal.
    phash_cos_table is injected as a VALUES list, so both engines run
    identical integer arithmetic end to end)."""
    from data_ingest_spark.extensions.multimodal import phash_cos_table
    cos = ", ".join(f"({u}, {i}, {c})" for u, i, c in phash_cos_table(8))
    return f"""
 p AS (SELECT doc_id,
              CAST(1 + doc_id % 13 AS INTEGER) AS w,
              CAST(1 + doc_id % 7 AS INTEGER) AS h,
              substr(repeat(md5(text), 9), 1,
                     CAST((1 + doc_id % 13) * (1 + doc_id % 7) * 3
                          AS INTEGER)) AS body
       FROM documents),
 ct AS (SELECT * FROM (VALUES {cos}) AS t(u, i, c)),
 gi AS (SELECT CAST(range AS INTEGER) AS g FROM range(0, 8)),
 g8 AS (SELECT p.doc_id, gi.g AS i, gj.g AS j,
               (ord(substr(body, (((gi.g * h) // 8) * w
                                  + ((gj.g * w) // 8)) * 3 + 1, 1))
              + ord(substr(body, (((gi.g * h) // 8) * w
                                  + ((gj.g * w) // 8)) * 3 + 2, 1))
              + ord(substr(body, (((gi.g * h) // 8) * w
                                  + ((gj.g * w) // 8)) * 3 + 3, 1))) // 3
                 AS gray
        FROM p, gi, gi AS gj),
 dct AS (SELECT g8.doc_id, cu.u AS u, cv.u AS v,
                SUM(CAST(g8.gray AS BIGINT) * CAST(cu.c AS BIGINT)
                    * CAST(cv.c AS BIGINT)) AS f
         FROM g8 JOIN ct cu ON cu.i = g8.i JOIN ct cv ON cv.i = g8.j
         GROUP BY 1, 2, 3),
 low AS (SELECT doc_id, u, v, f FROM dct
         WHERE u < 4 AND v < 4 AND NOT (u = 0 AND v = 0)),
 med AS (SELECT doc_id, f AS m FROM
           (SELECT doc_id, f, ROW_NUMBER() OVER (PARTITION BY doc_id
                                                 ORDER BY f, u, v) AS rn
            FROM low)
         WHERE rn = 8),
 ph AS (SELECT l.doc_id,
               CAST(SUM(CASE WHEN l.f > med.m
                             THEN 1 << (l.u * 4 + l.v) ELSE 0 END)
                    AS BIGINT) AS phash,
               CAST(SUM(CASE WHEN l.f > med.m THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above
        FROM low l JOIN med ON med.doc_id = l.doc_id
        GROUP BY 1)"""


@_q("x126_phash", "WITH" + _phash_core_sql()
    + "\nSELECT doc_id, phash, n_above FROM ph")
def q_phash(spark, sf):
    """Perceptual image hash (mm.phash) over REAL decoded pixels —
    the x91 synthetic P6 PPM payloads run through the pure-numpy
    decoder, then gray → 8×8 nearest-neighbor downsample → exact
    fixed-point 2-D DCT → median-thresholded low-frequency bits. The
    oracle recomputes every stage from the raster in SQL with the
    SAME quantized DCT basis, so decode, sampling, transform, and
    thresholding are all value-checked."""
    docs = load(spark, sf, "documents")
    w = (F.lit(1) + F.col("doc_id") % 13).cast("int")
    h = (F.lit(1) + F.col("doc_id") % 7).cast("int")
    body = F.repeat(F.md5(F.col("text").cast("binary")), 9).substr(
        F.lit(1), (w * h * 3).cast("int"))
    payload = F.concat(
        F.lit("P6\n# synthetic\n"), w.cast("string"), F.lit(" "),
        h.cast("string"), F.lit("\n255\n"), body).cast("binary")
    dec = mm.decode_image(docs.select("doc_id", payload.alias("payload")))
    return mm.phash(dec)


@_q("x127_phash_neardup", "WITH" + _phash_core_sql() + """
,pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                    AS hamming
           FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2
""")
def q_phash_neardup(spark, sf):
    """Visual near-dup pairs (mm.phash_neardup_pairs): banded Hamming
    join over the x126 hashes — max_dist+1 bands give PERFECT recall
    by pigeonhole, so the banded plan provably equals the oracle's
    brute-force all-pairs scan while doing a bucket join's work."""
    docs = load(spark, sf, "documents")
    w = (F.lit(1) + F.col("doc_id") % 13).cast("int")
    h = (F.lit(1) + F.col("doc_id") % 7).cast("int")
    body = F.repeat(F.md5(F.col("text").cast("binary")), 9).substr(
        F.lit(1), (w * h * 3).cast("int"))
    payload = F.concat(
        F.lit("P6\n# synthetic\n"), w.cast("string"), F.lit(" "),
        h.cast("string"), F.lit("\n255\n"), body).cast("binary")
    dec = mm.decode_image(docs.select("doc_id", payload.alias("payload")))
    return mm.phash_neardup_pairs(mm.phash(dec), bits=16, max_dist=2)


@_q("x128_kneser_ney", r"""
WITH tk AS (SELECT string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 bg AS (SELECT unnest([{'w1': t[i], 'w2': t[i + 1]}
                       FOR i IN generate_series(1, len(t) - 1)],
                      recursive := true)
        FROM tk WHERE len(t) >= 2),
 counts AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2),
 ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
                CAST(COUNT(*) AS BIGINT) AS nr
         FROM counts GROUP BY 1),
 cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nl
          FROM counts GROUP BY 1),
 tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM counts)
SELECT counts.w1, counts.w2, counts.c AS pair_count,
       ROUND((CAST(counts.c AS DOUBLE) - 0.75) / CAST(ctx.cw1 AS DOUBLE)
             + (0.75 * CAST(ctx.nr AS DOUBLE) / CAST(ctx.cw1 AS DOUBLE))
               * (CAST(cont.nl AS DOUBLE) / tot.t), 6) AS p_kn
FROM counts JOIN ctx ON ctx.w1 = counts.w1
            JOIN cont ON cont.w2 = counts.w2
            CROSS JOIN tot
ORDER BY counts.c DESC, counts.w1, counts.w2 LIMIT 100
""")
def q_kneser_ney(spark, sf):
    """Interpolated Kneser-Ney bigram LM (tx.kneser_ney_bigrams):
    absolute discount 0.75 with continuation-count backoff — the
    Chen-Goodman benchmark smoother, derived entirely from one
    bigram-count aggregation; top-100 bigrams value-checked."""
    return tx.kneser_ney_bigrams(load(spark, sf, "documents"))


@_q("x129_kmv_timeline", """
WITH dh AS (SELECT DISTINCT CAST(ts AS DATE) AS d,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) AS h
            FROM events),
 days AS (SELECT DISTINCT d AS d2 FROM dh),
 cum AS (SELECT DISTINCT days.d2, dh.h
         FROM days JOIN dh ON dh.d <= days.d2),
 r AS (SELECT d2, h, ROW_NUMBER() OVER (PARTITION BY d2 ORDER BY h) AS rk,
              COUNT(*) OVER (PARTITION BY d2) AS nd
       FROM cum)
SELECT CAST(d2 AS VARCHAR) AS day, CAST(MAX(nd) AS BIGINT) AS n_exact,
       ROUND(CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
             ELSE 63.0 / (MAX(CASE WHEN rk = 64 THEN h END)
                          / 1152921504606846976.0) END, 6) AS kmv_estimate
FROM r WHERE rk <= 64 GROUP BY d2
""")
def q_kmv_timeline(spark, sf):
    """Cumulative distinct-user timeline from merged per-day KMV
    sketches (sk.kmv_timeline): the oracle sketches each day's full
    cumulative prefix from scratch, so the row-for-row match PROVES
    the merge identity min-k(union) = min-k(union of per-day min-k) —
    the property that lets an incremental ingest keep only bounded
    per-batch state."""
    from data_ingest_spark.extensions.sketches import kmv_timeline
    return kmv_timeline(load(spark, sf, "events"))


@_q("x130_ppjoin", f"""
WITH corpus AS ({_NEARDUP_SQL}),{_shingle_ctes('corpus')},
 sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1),
 inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
           FROM shx a JOIN shx b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT i.id_a, i.id_b, ROUND(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
             JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.6
""")
def q_ppjoin(spark, sf):
    """Exact set-similarity self-join via prefix filtering
    (dd.ppjoin, the PPJoin/AllPairs construction): only each
    document's rarest n - ceil(0.6n) + 1 shingles are indexed, yet
    recall is provably perfect — the oracle verifies that by brute
    all-pairs over every shingle-sharing pair."""
    return dd.ppjoin(_neardup_corpus(spark, sf))


def _bfs_oracle_sql(rounds: int = 8) -> str:
    """g3 oracle: multi-source BFS unrolled as ``rounds`` Bellman-Ford
    relaxations over the undirected k=10 kNN graph (exact integer
    distances make every round value-checkable, the g1 convention)."""
    ctes = [f"WITH {_KNN_EDGES_SQL},",
            " d AS (SELECT src, dst FROM r WHERE rank <= 10),",
            " und AS MATERIALIZED (SELECT src, dst FROM d"
            " UNION SELECT dst, src FROM d),",
            " nodes AS (SELECT DISTINCT src AS id FROM und),",
            " d0 AS (SELECT id, CASE WHEN CAST(id AS BIGINT) % 100 = 0"
            " THEN 0 END AS d FROM nodes),"]
    # MATERIALIZED is load-bearing: every round reads the previous one
    # twice (carry + relax), and an inlined CTE chain would expand the
    # kNN base plan 2^rounds times.
    for r in range(1, rounds + 1):
        ctes.append(
            f" d{r} AS MATERIALIZED (SELECT p.id, MIN(p.d) AS d FROM"
            f" (SELECT id, d FROM d{r-1}"
            f"  UNION ALL"
            f"  SELECT e.dst AS id, x.d + 1 AS d"
            f"  FROM d{r-1} x JOIN und e ON e.src = x.id"
            f"  WHERE x.d IS NOT NULL) p GROUP BY 1),")
    body = "\n".join(ctes).rstrip(",")
    return (f"{body}\n"
            f"SELECT id AS vec_id, CAST(d AS BIGINT) AS hops"
            f" FROM d{rounds}")


@_q("g3_bfs_hops", _bfs_oracle_sql(8))
def q_bfs_hops(spark, sf):
    """Multi-source BFS hop distances (graph.bfs_hops) from the
    vec_id%100=0 anchor set over the k=10 kNN graph — 8 relaxation
    rounds, each one join + one groupBy-min; the oracle unrolls the
    same rounds so every hop count is value-checked."""
    from data_ingest_spark.operators.graph import bfs_hops
    knn = _emb_knn(spark, sf, k=10, cached=True)
    seeds = (load(spark, sf, "embeddings")
             .filter(F.col("vec_id") % 100 == 0)
             .select(F.col("vec_id").cast("string").alias("id")))
    return (bfs_hops(knn.select("src", "dst"), seeds)
            .select(F.col("id").alias("vec_id"), "hops"))


@_q("x131_standardize_dims", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 px AS (SELECT vec_id,
               unnest(list_transform(range(1, len(v) + 1),
                      i -> {'dim': i - 1,
                            'q': CAST(round(v[CAST(i AS INT)] * 1000000)
                                      AS BIGINT)}),
                      recursive := true)
        FROM e),
 st AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS ss
        FROM px GROUP BY 1)
SELECT px.vec_id, CAST(px.dim AS BIGINT) AS dim,
       CASE WHEN st.ss * st.n = st.s * st.s THEN 0.0
            ELSE ROUND((CAST(px.q AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
                 / sqrt(CAST(st.ss AS DOUBLE) / st.n
                        - (CAST(st.s AS DOUBLE) / st.n)
                          * (CAST(st.s AS DOUBLE) / st.n)), 6)
       END AS z
FROM px JOIN st USING (dim)
""")
def q_standardize_dims(spark, sf):
    """Per-dimension z-score standardization of the embeddings table
    (sim.standardize_dims): exact int64 moment aggregates + one
    pinned-order double expression, so the full 64-dim standardized
    matrix is value-checked row for row."""
    return sim.standardize_dims(load(spark, sf, "embeddings"))


@_q("x132_log_odds", rf"""
WITH tk AS (SELECT source AS g,
                   string_split_regex(lower(text), '\s+') AS t
            FROM documents),
 uni AS (SELECT g, u.w, CAST(COUNT(*) AS BIGINT) AS c
         FROM (SELECT g, unnest(t) AS w FROM tk) u GROUP BY 1, 2),
 ng AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM uni GROUP BY 1),
 cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM uni GROUP BY 1),
 n AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
 sc AS (SELECT uni.g, uni.w, uni.c, cw.cw - uni.c AS c_out,
               (ln((CAST(uni.c AS DOUBLE) + 0.5)
                   / (CAST(ng.ng AS DOUBLE) - CAST(uni.c AS DOUBLE) + 0.5))
                - ln((CAST(cw.cw - uni.c AS DOUBLE) + 0.5)
                     / (n.n - CAST(ng.ng AS DOUBLE)
                        - CAST(cw.cw - uni.c AS DOUBLE) + 0.5)))
               / sqrt(1.0 / (CAST(uni.c AS DOUBLE) + 0.5)
                      + 1.0 / (CAST(cw.cw - uni.c AS DOUBLE) + 0.5)) AS z
         FROM uni JOIN ng USING (g) JOIN cw USING (w) CROSS JOIN n),
 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
                                    ORDER BY ROUND(z, 6) DESC, w) AS rk
       FROM sc)
SELECT g AS source, w AS token, c AS c_in, c_out,
       ROUND(z, 6) AS z
FROM r WHERE rk <= 10
""")
def q_log_odds(spark, sf):
    """Per-source discriminative terms by smoothed log-odds z-score
    (tx.log_odds_terms, the Monroe 'Fightin Words' construction with
    a Haldane prior) — variance-aware source fingerprints for mixing
    and exclusion decisions; top-10 per source value-checked."""
    return tx.log_odds_terms(load(spark, sf, "documents"))


@_q("x133_mannwhitney", """
WITH e AS (SELECT event_type AS g, value AS v FROM events),
 vc AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
 tv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM vc GROUP BY 1),
 rk AS (SELECT v, t, SUM(t) OVER (ORDER BY v) - t AS less FROM tv),
 rg AS (SELECT vc.g, CAST(SUM(vc.c) AS BIGINT) AS ng,
               SUM(vc.c * (CAST(rk.less AS DOUBLE)
                           + (CAST(rk.t AS DOUBLE) + 1.0) / 2.0)) AS rsum
        FROM vc JOIN rk USING (v) GROUP BY 1),
 tot AS (SELECT CAST(SUM(t) AS DOUBLE) AS nn,
                CAST(SUM(t * t * t - t) AS DOUBLE) AS tie FROM tv)
SELECT g AS event_type, ng AS n_g,
       ROUND(rsum - CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) + 1.0) / 2.0,
             6) AS u_stat,
       ROUND((rsum - CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) + 1.0) / 2.0
              - CAST(ng AS DOUBLE) * (nn - CAST(ng AS DOUBLE)) / 2.0)
             / sqrt(CAST(ng AS DOUBLE) * (nn - CAST(ng AS DOUBLE)) / 12.0
                    * ((nn + 1.0) - tie / (nn * (nn - 1.0)))), 6) AS z
FROM rg CROSS JOIN tot
""")
def q_mannwhitney(spark, sf):
    """Mann-Whitney U of each event type's value distribution vs the
    rest (pf.mannwhitney_u): exact midranks via the bucketed two-pass
    global rank, tie-corrected normal z — the drift-triage sibling of
    x96 under a full value oracle."""
    from data_ingest_spark.extensions.profile import mannwhitney_u
    return mannwhitney_u(load(spark, sf, "events"))


@_q("x134_charset_quality", r"""
WITH c AS (SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0
                       THEN text || ' café � naïve'
                       ELSE text END AS text
           FROM documents),
 m AS (SELECT doc_id, length(text) AS nc,
              length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
                AS na,
              length(text) - length(regexp_replace(text,
                '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS ctl,
              length(text) - length(regexp_replace(text, '�', '',
                                                   'g')) AS rep
       FROM c)
SELECT doc_id, CAST(nc AS BIGINT) AS n_chars,
       CAST(na AS BIGINT) AS n_non_ascii,
       ROUND(na * 1.0 / nc, 6) AS non_ascii_ratio,
       CAST(ctl AS BIGINT) AS n_control,
       CAST(rep AS BIGINT) AS n_replacement,
       (ctl = 0 AND rep = 0 AND ROUND(na * 1.0 / nc, 6) < 0.3)
         AS charset_ok
FROM m
""")
def q_charset_quality(spark, sf):
    """Encoding-health screen (tx.charset_quality) over a corpus with
    deterministic mojibake injected into every fifth document (accents
    + a U+FFFD replacement char), so the non-ASCII ratio, control and
    replacement counts, and the ok verdict are all value-checked on
    both clean and damaged rows."""
    docs = load(spark, sf, "documents")
    mutated = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"),
                        F.lit(" café � naïve")))
        .otherwise(F.col("text")).alias("text"))
    return tx.charset_quality(mutated)


@_q("e28_attribution", """
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                  THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS touch
           FROM events),
 c AS (SELECT COALESCE(touch, 'direct') AS touch_type FROM o
       WHERE event_type = 'purchase'),
 tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM c)
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       ROUND(COUNT(*) / tot.n, 6) AS share
FROM c CROSS JOIN tot GROUP BY 1, tot.n
""")
def q_attribution(spark, sf):
    """Last-touch conversion attribution (ev.last_touch_attribution):
    each purchase credits the user's most recent preceding
    non-purchase event type (ts then event_id tie-break), 'direct'
    when none — the point-in-time-correct windowed formulation."""
    return ev.last_touch_attribution(load(spark, sf, "events"))


@_q("e29_window_funnel", """
WITH u1 AS (SELECT user_id, MIN(epoch(ts)) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
 r2 AS (SELECT e.user_id, MIN(epoch(e.ts)) AS t FROM events e
        JOIN u1 USING (user_id)
        WHERE e.event_type = 'click' AND epoch(e.ts) > u1.t1
        GROUP BY 1),
 a2 AS (SELECT u1.user_id, u1.t1,
               CASE WHEN r2.t IS NOT NULL AND r2.t - u1.t1 <= 604800.0
                    THEN r2.t END AS t2
        FROM u1 LEFT JOIN r2 USING (user_id)),
 r3 AS (SELECT e.user_id, MIN(epoch(e.ts)) AS t FROM events e
        JOIN a2 USING (user_id)
        WHERE a2.t2 IS NOT NULL AND e.event_type = 'signup'
          AND epoch(e.ts) > a2.t2
        GROUP BY 1),
 a3 AS (SELECT a2.user_id, a2.t1, a2.t2,
               CASE WHEN r3.t IS NOT NULL AND r3.t - a2.t1 <= 604800.0
                    THEN r3.t END AS t3
        FROM a2 LEFT JOIN r3 USING (user_id)),
 r4 AS (SELECT e.user_id, MIN(epoch(e.ts)) AS t FROM events e
        JOIN a3 USING (user_id)
        WHERE a3.t3 IS NOT NULL AND e.event_type = 'purchase'
          AND epoch(e.ts) > a3.t3
        GROUP BY 1),
 a4 AS (SELECT a3.user_id, a3.t1, a3.t2, a3.t3,
               CASE WHEN r4.t IS NOT NULL AND r4.t - a3.t1 <= 604800.0
                    THEN r4.t END AS t4
        FROM a3 LEFT JOIN r4 USING (user_id))
SELECT CAST(1 + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN t4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS funnel_depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a4 GROUP BY 1
""")
def q_window_funnel(spark, sf):
    """Time-bound ordered funnel (ev.window_funnel, windowFunnel
    semantics with the deterministic greedy-earliest chain):
    view -> click -> signup -> purchase within 7 days of the first
    view; the oracle walks the same chain step by step, so every
    user's depth is value-checked via the histogram."""
    return ev.window_funnel(
        load(spark, sf, "events"),
        steps=["view", "click", "signup", "purchase"])


@_q("x140_simhash_neardup", f"""
WITH corpus AS ({_NEARDUP_SQL}),
 toks AS (SELECT doc_id, unnest(string_split_regex(lower(text),
                                                   '\\s+')) AS tok
          FROM corpus),
 h AS (SELECT doc_id, md5(tok) AS hh FROM toks),
 bits AS (SELECT doc_id, {_SIMHASH_BITS} FROM h GROUP BY doc_id),
 sh AS (SELECT doc_id, {_SIMHASH_CONCAT} AS simhash FROM bits),
 v AS (SELECT doc_id,
              CAST(list_sum(list_transform(range(1, 17),
                   i -> CASE WHEN substr(simhash, CAST(i AS INT), 1)
                               = '1'
                             THEN 1 << (16 - CAST(i AS INT))
                             ELSE 0 END)) AS BIGINT) AS hv
       FROM sh),
 p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.hv, b.hv)) AS BIGINT) AS hamming
       FROM v a JOIN v b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM p WHERE hamming <= 2
""")
def q_simhash_neardup(spark, sf):
    """Text near-dup pairs by banded Hamming join over SimHash
    (tx.simhash -> mm.phash_neardup_pairs): max_dist+1 bands give
    pigeonhole-perfect recall, proven against the oracle's brute
    all-pairs scan — the text sibling of x127 and the scalable
    shortlist ahead of exact Jaccard verification (x130)."""
    sh = tx.simhash(_neardup_corpus(spark, sf))
    hv = sh.select("doc_id",
                   F.conv(F.col("simhash"), 2, 10).cast("long")
                   .alias("hv"))
    return mm.phash_neardup_pairs(hv, hash_col="hv", bits=16,
                                  max_dist=2)


@_q("x135_mutual_knn", f"""
WITH {_KNN_EDGES_SQL},
 t1 AS (SELECT src, dst, cosine FROM r WHERE rank = 1)
SELECT a.src AS id_a, a.dst AS id_b, a.cosine
FROM t1 a JOIN t1 b ON a.src = b.dst AND a.dst = b.src
WHERE a.src < a.dst
""")
def q_mutual_knn(spark, sf):
    """Reciprocal top-1 neighbor pairs (nb.mutual_knn_pairs) over the
    exact kNN edge list — the high-precision alignment shortlist used
    inside MNN/bitext/record-linkage pipelines."""
    from data_ingest_spark.operators.neighbors import mutual_knn_pairs
    return mutual_knn_pairs(_emb_knn(spark, sf, k=10, cached=True))


@_q("x136_stratified_kfold", """
WITH h AS (SELECT doc_id, lang,
                  md5('17:' || CAST(doc_id AS VARCHAR)) AS hh
           FROM documents),
 r AS (SELECT doc_id, lang,
              ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY hh, doc_id) AS rn
       FROM h)
SELECT doc_id, lang AS stratum,
       CAST((rn - 1) % 5 AS BIGINT) AS fold
FROM r
""")
def q_stratified_kfold(spark, sf):
    """Deterministic stratified 5-fold assignment (sp.stratified_kfold,
    seed 17): md5-permuted round-robin within each language stratum,
    so every fold carries each stratum's share to within one row."""
    from data_ingest_spark.extensions.sampling import stratified_kfold
    return stratified_kfold(load(spark, sf, "documents"), k=5)


@_q("x137_vocab_coverage", r"""
WITH t AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
           FROM documents),
 c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY 1),
 rk AS (SELECT ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank,
               SUM(n) OVER (ORDER BY n DESC, w) AS mass
        FROM c),
 tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
 tgt AS (SELECT p.pct, (tot.total * p.pct + 99) // 100 AS need
         FROM (VALUES (50), (75), (90), (95), (99)) AS p(pct)
         CROSS JOIN tot)
SELECT CAST(tgt.pct AS BIGINT) AS pct,
       CAST(MIN(rk.rank) AS BIGINT) AS vocab_needed,
       CAST(MIN(rk.mass) AS BIGINT) AS tokens_covered
FROM rk JOIN tgt ON rk.mass >= tgt.need
GROUP BY 1
""")
def q_vocab_coverage(spark, sf):
    """Vocabulary coverage curve (tx.vocab_coverage): entries needed
    to cover 50/75/90/95/99% of corpus tokens — the tokenizer/embed-
    table sizing curve, ranked scalably by count-bucket prefix sums."""
    return tx.vocab_coverage(load(spark, sf, "documents"))


@_q("x138_psi_drift", """
WITH e AS (SELECT event_type AS g,
                  CAST(FLOOR(value / 50.0) AS BIGINT) AS b,
                  (event_id % 2 = 0) AS ref FROM events),
 counts AS (SELECT g, b,
                   CAST(SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT)
                     AS cr,
                   CAST(SUM(CASE WHEN ref THEN 0 ELSE 1 END) AS BIGINT)
                     AS cc
            FROM e GROUP BY 1, 2),
 tots AS (SELECT g, CAST(SUM(cr) AS DOUBLE) AS nr,
                 CAST(SUM(cc) AS DOUBLE) AS nc,
                 CAST(COUNT(*) AS DOUBLE) AS nb
          FROM counts GROUP BY 1),
 terms AS (SELECT counts.g,
                  ((CAST(cr AS DOUBLE) + 0.5) / (nr + 0.5 * nb)
                   - (CAST(cc AS DOUBLE) + 0.5) / (nc + 0.5 * nb))
                  * ln(((CAST(cr AS DOUBLE) + 0.5) / (nr + 0.5 * nb))
                       / ((CAST(cc AS DOUBLE) + 0.5)
                          / (nc + 0.5 * nb))) AS t
           FROM counts JOIN tots USING (g))
SELECT g AS event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       ROUND(SUM(t), 6) AS psi
FROM terms GROUP BY 1
""")
def q_psi_drift(spark, sf):
    """Population Stability Index per event type between the even/odd
    event-id slices (pf.psi_drift) — a deterministic A/A split, so
    PSI near 0 is itself the calibration check; Laplace-smoothed
    bucket shares make every term finite and value-checkable."""
    from data_ingest_spark.extensions.profile import psi_drift
    return psi_drift(load(spark, sf, "events"))


@_q("x139_feature_hash", r"""
WITH tk AS (SELECT doc_id, unnest(string_split_regex(lower(text),
                                                     '\s+')) AS w
            FROM documents),
 m AS (SELECT doc_id,
              CAST(concat('0x', substr(md5(w), 1, 7)) AS BIGINT)
                % 1024 AS dim,
              CAST(concat('0x', substr(md5(w), 8, 1)) AS BIGINT)
                % 2 * 2 - 1 AS sgn
       FROM tk)
SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS weight
FROM m GROUP BY 1, 2 HAVING SUM(sgn) <> 0
""")
def q_feature_hash(spark, sf):
    """Hashing-trick featurization (tx.feature_hash): md5 token ->
    1024-dim signed counts, vocabulary-free and mergeable; the exact
    long-form feature matrix is value-checked."""
    return tx.feature_hash(load(spark, sf, "documents"))


