"""LLM-pipeline extension queries, first wave: exact/fuzzy dedup, MinHash LSH, ANN, text quality, langid, profiling, sampling, multimodal metadata.

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
from data_ingest_spark.harness.registry import events_df  # noqa: E402

# ------------------------------------------------- X: LLM-pipeline extensions
from data_ingest_spark.extensions import (dedup as dd, multimodal as mm,  # noqa: E402
                                          similarity as sim, text as tx)

# Deterministic duplicate-bearing corpora built from `documents` (the
# synthetic corpus has no duplicates, so each dedup query plants its
# own: full copies for exact dedup, head-truncated copies for near-dup).
_DUP_SQL = ("SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0")
_NEARDUP_SQL = (
    "SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000, "
    "array_to_string(string_split_regex(text, '\\s+')[3:], ' ') "
    "FROM documents WHERE doc_id % 10 = 0")


def _dup_corpus(spark, sf):
    docs = load(spark, sf, "documents").select("doc_id", "text")
    return docs.unionByName(docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"))


def _neardup_corpus(spark, sf):
    docs = load(spark, sf, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 3, 1 << 20), " ")
        .alias("text"))
    return docs.unionByName(mutated)


def _shingle_ctes(src: str) -> str:
    """DuckDB CTEs mirroring text.shingles_col(k=3) + dedup.shingle_sets."""
    return f"""
 toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM {src}),
 shl AS (SELECT doc_id,
           CASE WHEN len(tk) >= 3
                THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                      FOR i IN generate_series(1, len(tk) - 2)]
                ELSE [array_to_string(tk, ' ')] END AS shingles
         FROM toks),
 shx AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shl)"""


@_q("x1_exact_dedup", f"""
WITH corpus AS ({_DUP_SQL})
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
""")
def q_exact_dedup(spark, sf):
    return dd.exact_dedup(_dup_corpus(spark, sf))


def _minhash_params_values() -> str:
    from data_ingest_spark.extensions.dedup import hash_params
    return ", ".join(f"({j}, {a}, {b})"
                     for j, (a, b) in enumerate(hash_params(12)))


# The MinHash-LSH pipeline as reusable CTE chains (expect `corpus`
# and the _shingle_ctes in scope). _MINHASH_BAND_CTES ends at band
# buckets + sizes; the candidate/verify stage differs per use (x2/x57
# pair within the corpus, x59 joins across the incoming/existing
# boundary).
_MINHASH_BAND_CTES = f"""
 sig AS (SELECT s.doc_id, j.j,
                MIN((j.a * CAST(concat('0x', substr(md5(s.shingle), 1, 7))
                            AS BIGINT) + j.b) % 2147483647) AS mh
         FROM shx s CROSS JOIN (VALUES {_minhash_params_values()})
              j(j, a, b)
         GROUP BY 1, 2),
 band AS (SELECT doc_id, j // 3 AS band,
                 md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j))
                   AS bucket
          FROM sig GROUP BY doc_id, j // 3),
 sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1)"""

_MINHASH_FOUND_CTES = _MINHASH_BAND_CTES + """,
 cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < b.doc_id),
 inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS i
           FROM cand c JOIN shx x ON x.doc_id = c.id_a
                       JOIN shx y ON y.doc_id = c.id_b AND y.shingle = x.shingle
           GROUP BY 1, 2),
 found AS (SELECT i.id_a, i.id_b,
                  ROUND(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
           FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
                        JOIN sizes sb ON sb.doc_id = i.id_b
           WHERE i.i / (sa.n + sb.n - i.i) >= 0.5)"""


@_q("x2_minhash_lsh_pairs", f"""
WITH corpus AS ({_NEARDUP_SQL}),{_shingle_ctes('corpus')},{_MINHASH_FOUND_CTES}
SELECT id_a, id_b, jaccard FROM found
""")
def q_minhash_lsh(spark, sf):
    pairs = dd.near_dup_pairs(_neardup_corpus(spark, sf), threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@_q("x57_minhash_recall", f"""
WITH corpus AS ({_NEARDUP_SQL}),{_shingle_ctes('corpus')},{_MINHASH_FOUND_CTES},
 planted AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
             FROM documents WHERE doc_id % 10 = 0),
 tint AS (SELECT p.id_a, p.id_b, COUNT(*) AS i
          FROM planted p JOIN shx x ON x.doc_id = p.id_a
                         JOIN shx y ON y.doc_id = p.id_b
                                   AND y.shingle = x.shingle
          GROUP BY 1, 2),
 truth AS (SELECT t.id_a, t.id_b
           FROM tint t JOIN sizes sa ON sa.doc_id = t.id_a
                       JOIN sizes sb ON sb.doc_id = t.id_b
           WHERE t.i / (sa.n + sb.n - t.i) >= 0.5)
SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
       CAST(SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       AS n_found,
       ROUND(SUM(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS recall
FROM truth t LEFT JOIN found f
  ON f.id_a = t.id_a AND f.id_b = t.id_b
""")
def q_minhash_recall(spark, sf):
    """Recall of the MinHash-LSH near-dup pipeline against ground
    truth: the planted (doc, truncated-copy) pairs whose TRUE Jaccard
    clears the threshold. The x42 eval-rigor pattern applied to dedup
    — an approximate path ships with its measured recall, under a
    full value oracle (both sides of the comparison are
    deterministic)."""
    corpus = _neardup_corpus(spark, sf)
    docs = load(spark, sf, "documents")
    planted = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1000000).alias("id_b"))
    membership = dd.shingle_sets(corpus)
    truth = (dd.jaccard_of_pairs(planted, membership)
             .filter(F.col("jaccard") >= 0.5).select("id_a", "id_b"))
    found = (dd.near_dup_pairs(corpus, threshold=0.5)
             .select("id_a", "id_b"))
    caught = truth.join(found, ["id_a", "id_b"], "left_semi")
    return (truth.agg(F.count("*").alias("n_truth"))
            .crossJoin(caught.agg(F.count("*").alias("n_found")))
            .select("n_truth", "n_found",
                    F.round(F.col("n_found") / F.col("n_truth"), 6)
                    .alias("recall")))


@_q("x59_incremental_neardup", f"""
WITH corpus AS ({_NEARDUP_SQL}),{_shingle_ctes('corpus')},{_MINHASH_BAND_CTES},
 cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
          FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id >= 1000000 AND b.doc_id < 1000000),
 inter AS (SELECT c.id_new, c.id_old, COUNT(*) AS i
           FROM cand c JOIN shx x ON x.doc_id = c.id_new
                       JOIN shx y ON y.doc_id = c.id_old
                                 AND y.shingle = x.shingle
           GROUP BY 1, 2)
SELECT i.id_new, i.id_old,
       ROUND(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_new
             JOIN sizes sb ON sb.doc_id = i.id_old
WHERE i.i / (sa.n + sb.n - i.i) >= 0.5
""")
def q_incremental_neardup(spark, sf):
    """Daily-ingest fuzzy dedup: LSH candidates ACROSS the
    incoming/existing boundary only (never within a side, never
    all-pairs), verified by exact Jaccard. Incoming = the planted
    truncated copies; existing = the base documents."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 3, 1 << 20),
                     " ").alias("text"))
    pairs = dd.near_dups_against(incoming, docs, threshold=0.5)
    return pairs.select("id_new", "id_old",
                        F.round("jaccard", 6).alias("jaccard"))


@_q("x15_dup_clusters", """
WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL
                SELECT doc_id + 1000000, text
                FROM documents WHERE doc_id % 10 = 0),
 groups AS (SELECT md5(text) AS h, MIN(doc_id) AS keep, COUNT(*) AS n
            FROM corpus GROUP BY 1 HAVING COUNT(*) > 1),
 pairs AS (SELECT g.keep AS id_a, c.doc_id AS id_b
           FROM groups g JOIN corpus c ON md5(c.text) = g.h
           WHERE c.doc_id > g.keep),
 edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
 nodes AS (SELECT DISTINCT src AS id FROM edges),
 walk AS (
   WITH RECURSIVE reach(src, dst) AS (
     SELECT id, id FROM nodes
     UNION
     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
   SELECT src, dst FROM reach)
SELECT src AS doc_id, MIN(dst) AS cluster FROM walk GROUP BY 1
""")
def q_dup_clusters(spark, sf):
    """Connected components over exact-duplicate pairs (deterministic
    star edges: every copy links to the group minimum; component label
    = min id, matched by DuckDB's recursive transitive closure)."""
    corpus = _dup_corpus(spark, sf)
    groups = dd.exact_dedup(corpus)
    h = F.md5(F.col("text").cast("binary"))
    pairs = (corpus.select("doc_id", h.alias("content_hash"))
             .join(groups, "content_hash")
             .filter(F.col("doc_id") > F.col("keep_id"))
             .select(F.col("keep_id").alias("id_a"),
                     F.col("doc_id").alias("id_b")))
    return dd.dup_clusters(pairs)


_SIMHASH_BITS = ", ".join(
    f"CASE WHEN SUM(strpos('0123456789abcdef', substr(hh, {p}, 1)) - 8.5) > 0 "
    f"THEN '1' ELSE '0' END AS b{p}" for p in range(1, 17))
_SIMHASH_CONCAT = " || ".join(f"b{p}" for p in range(1, 17))


@_q("x3_simhash", f"""
WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
              FROM documents),
 h AS (SELECT doc_id, md5(tok) AS hh FROM toks),
 bits AS (SELECT doc_id, {_SIMHASH_BITS} FROM h GROUP BY doc_id)
SELECT doc_id, {_SIMHASH_CONCAT} AS simhash FROM bits
""")
def q_simhash(spark, sf):
    return tx.simhash(load(spark, sf, "documents"))


@_q("x4_jaccard_blocked", """
WITH d AS (SELECT doc_id, text, source || chr(1) || CAST(CAST(FLOOR(n_chars / 100) AS BIGINT) AS VARCHAR) AS blk
           FROM documents),
 shx AS (SELECT DISTINCT doc_id,
                unnest(string_split_regex(lower(text), '\\s+')) AS shingle
         FROM d),
 cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM d a JOIN d b ON a.blk = b.blk WHERE a.doc_id < b.doc_id),
 sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1),
 inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS i
           FROM cand c JOIN shx x ON x.doc_id = c.id_a
                       JOIN shx y ON y.doc_id = c.id_b AND y.shingle = x.shingle
           GROUP BY 1, 2)
SELECT i.id_a, i.id_b, ROUND(i.i / (sa.n + sb.n - i.i), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
             JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.6
""")
def q_jaccard_blocked(spark, sf):
    docs = load(spark, sf, "documents").withColumn(
        "_band", F.floor(F.col("n_chars") / 100).cast("long").cast("string"))
    pairs = dd.jaccard_pairs_blocked(docs, ["source", "_band"], k=1,
                                     threshold=0.6)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_ANN_Q = "vec_id % 50 = 0"
_COS = ("ROUND(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) "
        "* sqrt(list_dot_product(cv, cv))), 6)")


@_q("x5_ann_topk", f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE {_ANN_Q}),
 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
 s AS (SELECT q.query_id, c.neighbor_id, {_COS} AS cosine
       FROM q CROSS JOIN c WHERE c.neighbor_id <> q.query_id),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       FROM s)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""")
def q_ann_topk(spark, sf):
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    return sim.cosine_topk(emb, queries, k=5)


@_q("x62_truncation_eval", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 q AS (SELECT vec_id AS query_id, v AS qv, v[1:16] AS qv16
       FROM e WHERE {_ANN_Q}),
 s64 AS (SELECT q.query_id, e.vec_id AS nid,
                {_COS.replace('cv', 'e.v').replace('qv', 'q.qv')} AS c
         FROM q JOIN e ON e.vec_id <> q.query_id),
 r64 AS (SELECT query_id, nid, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY c DESC, nid) AS rk FROM s64),
 f64 AS (SELECT query_id, nid AS full_top1 FROM r64 WHERE rk = 1),
 s16 AS (SELECT q.query_id, e.vec_id AS nid,
                ROUND(list_dot_product(q.qv16, e.v[1:16])
                      / (sqrt(list_dot_product(q.qv16, q.qv16))
                         * sqrt(list_dot_product(e.v[1:16], e.v[1:16]))), 6)
                AS c
         FROM q JOIN e ON e.vec_id <> q.query_id),
 r16 AS (SELECT query_id, nid, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY c DESC, nid) AS rk FROM s16),
 f16 AS (SELECT query_id, nid AS trunc_top1 FROM r16 WHERE rk = 1)
SELECT f64.query_id, f64.full_top1, f16.trunc_top1,
       CAST(CASE WHEN f64.full_top1 = f16.trunc_top1
                 THEN 1 ELSE 0 END AS BIGINT) AS agree
FROM f64 JOIN f16 ON f16.query_id = f64.query_id
""")
def q_truncation_eval(spark, sf):
    """Matryoshka-style truncation evaluation: does the top-1 cosine
    neighbor at 16 of 64 dimensions agree with the full-dimension
    answer, per query? The measured-quality pattern applied to the
    memory/recall tradeoff every embedding store faces — truncated
    prefixes are the standard cheap first-stage retriever."""
    emb = load(spark, sf, "embeddings")
    qfull = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    full = (sim.cosine_topk(emb, qfull, k=1)
            .select("query_id", F.col("neighbor_id").alias("full_top1")))
    e16 = emb.withColumn("embedding", F.slice("embedding", 1, 16))
    q16 = e16.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    trunc = (sim.cosine_topk(e16, q16, k=1)
             .select("query_id", F.col("neighbor_id").alias("trunc_top1")))
    return (full.join(trunc, "query_id")
            .select("query_id", "full_top1", "trunc_top1",
                    (F.col("full_top1") == F.col("trunc_top1"))
                    .cast("long").alias("agree")))


@_q("x6_ann_ivf", f"""
WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE {_ANN_Q}),
 c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
       FROM embeddings),
 s AS (SELECT q.query_id, c.neighbor_id, {_COS} AS cosine
       FROM q JOIN c ON q.label = c.label WHERE c.neighbor_id <> q.query_id),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       FROM s)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""")
def q_ann_ivf(spark, sf):
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("embedding").alias("query_vec"))
    return sim.cosine_topk_ivf(emb, queries, k=5)


def _planes_sql() -> str:
    planes = sim.hyperplanes(4, 64)
    bits = []
    for row in planes:
        arr = "[" + ", ".join(str(x) for x in row) + "]"
        bits.append(f"CASE WHEN list_dot_product(v, {arr}) > 0 "
                    f"THEN '1' ELSE '0' END")
    return " || ".join(bits)


@_q("x11_ann_lsh", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 b AS (SELECT vec_id, v, {_planes_sql()} AS bkt FROM e),
 q AS (SELECT vec_id AS query_id, v AS qv, bkt FROM b WHERE {_ANN_Q}),
 s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              ROUND(list_dot_product(qv, c.v) / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
       FROM q JOIN b c ON q.bkt = c.bkt WHERE c.vec_id <> q.query_id),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       FROM s)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""")
def q_ann_lsh(spark, sf):
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    return sim.cosine_topk_lsh(emb, queries, k=5, n_planes=4, dim=64)


@_q("x17_embedding_dups", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 b AS (SELECT vec_id, v, {_planes_sql()} AS bkt FROM e),
 s AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
              ROUND(list_dot_product(a.v, c.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
       FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id)
SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.35
""")
def q_embedding_dups(spark, sf):
    """Embedding-cosine near-dup pairs within deterministic LSH
    buckets (the last dedup tier of the brief); both engines threshold
    the 6dp-rounded cosine."""
    emb = load(spark, sf, "embeddings")
    return sim.embedding_near_dups(emb, threshold=0.35)


_STOP_SQL = "['the', 'a', 'is', 'of', 'and', 'to', 'in', 'it']"


@_q("x7_text_quality", f"""
WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk,
                  length(text) AS nc,
                  length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS np,
                  text
           FROM documents),
 m AS (SELECT doc_id, len(tk) AS n_tokens, nc AS n_chars_m,
              np / nc AS pr,
              len(list_filter(tk, x -> list_contains({_STOP_SQL}, x))) / len(tk) AS sr
       FROM t)
SELECT doc_id, n_tokens, n_chars_m, ROUND(pr, 6) AS punct_ratio,
       ROUND(sr, 6) AS stopword_ratio,
       ROUND(0.3 * least(1.0, n_tokens / 100.0) + 0.4 * (1.0 - pr) + 0.3 * sr,
             6) AS quality_score
FROM m
""")
def q_text_quality(spark, sf):
    return tx.text_quality(load(spark, sf, "documents"))


@_q("x22_quality_deciles", f"""
WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk,
                  length(text) AS nc,
                  length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS np
           FROM documents),
 m AS (SELECT doc_id, len(tk) AS n_tokens, np / nc AS pr,
              len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))
                / len(tk) AS sr
       FROM t),
 q AS (SELECT doc_id,
              ROUND(0.3 * least(1.0, n_tokens / 100.0) + 0.4 * (1.0 - pr)
                    + 0.3 * sr, 6) AS qs
       FROM m),
 d AS (SELECT doc_id, qs,
              CAST(NTILE(10) OVER (ORDER BY qs, doc_id) AS BIGINT) AS decile
       FROM q)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(qs) AS min_score, MAX(qs) AS max_score
FROM d GROUP BY 1
""")
def q_quality_deciles(spark, sf):
    """Curriculum binning: documents ranked by quality score into 10
    equal-count deciles via the scalable NTILE (coarse-bucket rank +
    offset — no single-task global window), summarized per decile.
    Hash-matches DuckDB's NTILE."""
    from data_ingest_spark.operators.windows import ntile_scalable
    q = tx.text_quality(load(spark, sf, "documents")).select(
        "doc_id", F.col("quality_score").alias("qs"))
    d = ntile_scalable(q, 10, "qs", ["doc_id"], out_col="decile")
    return d.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("qs").alias("min_score"), F.max("qs").alias("max_score"))


def _lang_sql() -> str:
    scores = {lang: (f"len(list_filter(tk, x -> list_contains(["
                     + ", ".join(f"'{m}'" for m in markers)
                     + "], x)))")
              for lang, markers in sorted(tx.LANG_MARKERS.items())}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    case = " ".join(f"WHEN {expr} = best THEN '{lang}'"
                    for lang, expr in scores.items())
    return f"""
WITH t AS (SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS tk
           FROM documents),
 s AS (SELECT doc_id, lang, tk, {best} AS best FROM t)
SELECT doc_id, lang,
       CASE WHEN best > 0 THEN CASE {case} END ELSE 'und' END AS pred_lang
FROM s"""


@_q("x8_lang_id", _lang_sql())
def q_lang_id(spark, sf):
    return tx.lang_id(load(spark, sf, "documents")).select(
        "doc_id", "lang", "pred_lang")


@_q("x61_langid_eval", f"""
WITH pred AS ({_lang_sql()})
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS cell_accuracy
FROM pred GROUP BY 1, 2
""")
def q_langid_eval(spark, sf):
    """Language-ID confusion matrix against the labeled `lang` column
    — the measured-quality pattern (x42 ANN recall, x57 LSH recall)
    applied to the classifier: every approximate/heuristic path in
    the engine ships with its accuracy measured under a full oracle.
    cell_accuracy is 1.0 on diagonal cells and 0.0 off-diagonal by
    construction, making diagonal mass directly summable."""
    pred = tx.lang_id(load(spark, sf, "documents"))
    return (pred.groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.when(F.col("lang") == F.col("pred_lang"),
                                      1).otherwise(0)) / F.count("*"), 6)
                 .alias("cell_accuracy")))


@_q("x9_token_count", """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
            AS INT) AS n_tokens
FROM documents
""")
def q_token_count(spark, sf):
    return tx.token_count(load(spark, sf, "documents")).select(
        "doc_id", "n_tokens")


@_q("x10_fingerprint", f"""
WITH src AS (SELECT doc_id, text FROM documents),{_shingle_ctes('src')},
 d AS (SELECT doc_id, list_sort(list_distinct(list_transform(shingles,
                s -> md5(s)))) AS hs
       FROM shl)
SELECT doc_id, md5(array_to_string(hs[1:5], ',')) AS fingerprint FROM d
""")
def q_fingerprint(spark, sf):
    return tx.fingerprint(load(spark, sf, "documents")).select(
        "doc_id", "fingerprint")


@_q("x12_multimodal_meta", """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256, 'bin' AS format
FROM documents
""")
def q_multimodal_meta(spark, sf):
    docs = load(spark, sf, "documents").withColumn(
        "payload", F.col("text").cast("binary"))
    return mm.extract_binary_meta(docs)


@_q("x16_tfidf", """
WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+'))
                       AS token FROM documents),
 tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2),
 dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_count
           FROM tf GROUP BY 1 HAVING COUNT(*) >= 5),
 n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents)
SELECT t.doc_id, t.token, t.tf, d.df_count,
       ROUND(t.tf * (ln((1.0 + n.nd) / (1.0 + d.df_count)) + 1.0), 6)
         AS tfidf
FROM tf t JOIN dfreq d USING (token) CROSS JOIN n
""")
def q_tfidf(spark, sf):
    docs = load(spark, sf, "documents").select("doc_id", "text")
    out = tx.tf_idf(docs, min_df=5)
    return out.withColumn("tfidf", F.round("tfidf", 6))


@_q("x92_bm25", r"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+'))
                       AS token
              FROM documents),
 dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks
        GROUP BY 1),
 st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
 tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
        WHERE token IN ('join', 'hash', 'customer', 'filter', 'merge')
        GROUP BY 1, 2),
 dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_count FROM tf
         GROUP BY 1),
 s AS (SELECT t.token, t.doc_id, t.tf,
              ROUND(ln(CAST(1.0 AS DOUBLE)
                       + (st.n - d.df_count + CAST(0.5 AS DOUBLE))
                         / (d.df_count + CAST(0.5 AS DOUBLE)))
                    * (t.tf * CAST(2.2 AS DOUBLE))
                    / (t.tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + (CAST(0.75 AS DOUBLE) * l.dl) / st.avgdl)),
                    6) AS score
       FROM tf t JOIN dl l USING (doc_id) JOIN dfq d USING (token)
            CROSS JOIN st),
 r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                  ORDER BY score DESC, doc_id) AS rank FROM s)
SELECT token, doc_id, tf, score, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= 10
""")
def q_bm25(spark, sf):
    """Okapi BM25 retrieval (k1=1.2, b=0.75, Lucene idf): top-10
    documents per query term over the documents corpus — the classic
    lexical-retrieval scorer next to x16's TF-IDF. Constants are cast
    to DOUBLE on the oracle side so both engines run the identical
    IEEE op sequence."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    return tx.bm25(docs, ["join", "hash", "customer", "filter", "merge"])


@_q("x13_frame_sample", """
WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, CAST(g.i AS INTEGER) AS frame_idx,
       substring(hx, g.i*64+1, 64) AS frame_hex
FROM d, (SELECT unnest(generate_series(0, 24, 8)) AS i) g
WHERE g.i < greatest(nb // 32, 1)
""")
def q_frame_sample(spark, sf):
    """Video-style frame sampling (fake decode): every 8th 32-byte
    'frame' of the payload, ≤4 per doc. Oracle compares in the hex
    domain (hex of sliced bytes ≡ sliced hex)."""
    docs = load(spark, sf, "documents").withColumn(
        "payload", F.col("text").cast("binary"))
    out = mm.frame_sample(docs, every_n=8, max_frames=4, frame_bytes=32)
    return out.select("doc_id", "frame_idx",
                      F.hex("frame").alias("frame_hex"))


@_q("x14_resize_image", """
WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb FROM documents)
SELECT doc_id, 64 AS width, 64 AS height,
       substring(repeat(substring(hx, 1, 128),
                 CAST(4096 // greatest(least(nb, 64), 1) AS INTEGER) + 1),
                 1, 8192) AS pixels_hex
FROM d
""")
def q_resize_image(spark, sf):
    """decode(fake) → resize(64×64) two-stage mapInPandas chain; the
    oracle reproduces the deterministic tile-or-truncate in hex. Only
    (width, height, pixels) are oracle-compared — n_channels comes from
    sha256 digest BYTES, which DuckDB can't index into."""
    docs = load(spark, sf, "documents").withColumn(
        "payload", F.col("text").cast("binary"))
    decoded = mm.decode_image_fake(docs)
    out = mm.resize_image(decoded, width=64, height=64)
    return out.select("doc_id",
                      F.col("width").cast("int").alias("width"),
                      F.col("height").cast("int").alias("height"),
                      F.hex("pixels").alias("pixels_hex"))


@_q("x20_incremental_dedup", """
WITH existing AS (SELECT DISTINCT md5(text) AS h FROM documents),
 inc AS (SELECT doc_id + 1000000 AS doc_id, text FROM documents
         WHERE doc_id % 3 = 0
         UNION ALL
         SELECT doc_id + 2000000, text || ' [v2]' FROM documents
         WHERE doc_id % 5 = 0
         UNION ALL
         SELECT doc_id + 3000000, text || ' [v2]' FROM documents
         WHERE doc_id % 5 = 0),
 firsts AS (SELECT doc_id, md5(text) AS content_hash,
                   ROW_NUMBER() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rk
            FROM inc)
SELECT f.doc_id, f.content_hash FROM firsts f
WHERE f.rk = 1
  AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = f.content_hash)
""")
def q_incremental_dedup(spark, sf):
    """Daily-ingest dedup: a synthetic incoming batch (copies of the
    corpus + genuinely-new texts + batch-internal dups) anti-joined
    against the existing corpus's distinct content hashes. Only the
    new texts' first occurrences survive."""
    from data_ingest_spark.extensions.dedup import dedup_against
    docs = load(spark, sf, "documents").select("doc_id", "text")
    inc = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 2000000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" [v2]")).alias("text")))
        .unionAll(
            docs.filter(F.col("doc_id") % 5 == 0)
            .select((F.col("doc_id") + 3000000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" [v2]")).alias("text"))))
    out = dedup_against(inc, docs, id_col="doc_id", text_col="text")
    return out.select("doc_id",
                      F.md5(F.col("text").cast("binary"))
                      .alias("content_hash"))


@_q("x21_kmv_distinct", """
WITH v AS (SELECT DISTINCT lang,
                  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
           FROM documents),
 r AS (SELECT lang, h,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rk,
              COUNT(*) OVER (PARTITION BY lang) AS nd
       FROM v)
SELECT lang, CAST(MAX(nd) AS BIGINT) AS n_distinct_exact,
       ROUND(CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
             ELSE 63.0 / (MAX(CASE WHEN rk = 64 THEN h END)
                          / 1152921504606846976.0)
             END, 6) AS kmv_estimate
FROM r WHERE rk <= 64 GROUP BY lang
""")
def q_kmv_distinct(spark, sf):
    """KMV distinct sketch per language (k=64): deterministic integer
    hashing makes the *estimate itself* oracle-checkable — the sketch
    the reference pipeline would use for corpus cardinality dashboards."""
    from data_ingest_spark.extensions.sketches import kmv_distinct
    docs = load(spark, sf, "documents")
    return kmv_distinct(docs, "text", k=64, group_cols=["lang"])


@_q("x23_snapshot_diff", """
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents
             WHERE doc_id % 7 <> 0),
 new AS (SELECT doc_id,
                md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]'
                         ELSE text END) AS h
         FROM documents
         UNION ALL
         SELECT doc_id + 1000000, md5(text) FROM documents
         WHERE doc_id % 3 = 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h <> n.h THEN 'changed' END AS change
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h
""")
def q_snapshot_diff(spark, sf):
    """Corpus CDC: the old snapshot drops every 7th doc; the new one
    edits every 5th, restores the dropped, and appends copies of every
    3rd under new ids. The diff classifies added/removed/changed."""
    from data_ingest_spark.extensions.cdc import snapshot_diff
    docs = load(spark, sf, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = (docs.withColumn(
        "text", F.when(F.col("doc_id") % 5 == 0,
                       F.concat(F.col("text"), F.lit(" [edited]")))
        .otherwise(F.col("text")))
        .unionAll(docs.filter(F.col("doc_id") % 3 == 0)
                  .select((F.col("doc_id") + 1000000).alias("doc_id"),
                          "text")))
    return snapshot_diff(old, new)


@_q("v2_tpch_q1", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
           AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30'
GROUP BY 1, 2
""")
def q_tpch_q1(spark, sf):
    """TPC-H Q1 shape (pricing summary): the canonical wide
    single-shuffle aggregation with map-side partials; every arithmetic
    stays in whole-stage codegen."""
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-06-30").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"))


@_q("v3_tpch_q3", """
WITH r AS (SELECT l.l_orderkey, o.o_orderdate,
                  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                      AS revenue
           FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           WHERE c.c_mktsegment = 'BUILDING'
             AND o.o_orderdate < TIMESTAMP '1998-03-15'
             AND l.l_shipdate > TIMESTAMP '1998-03-15'
           GROUP BY 1, 2)
SELECT l_orderkey, o_orderdate, revenue FROM r
ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def q_tpch_q3(spark, sf):
    """TPC-H Q3 shape (shipping priority): selective dimension filter →
    two joins → aggregate → top-k. Revenue is rounded BEFORE ranking in
    both engines so the top-10 cut is deterministic; the limit runs as
    TakeOrderedAndProject."""
    cust = load(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    j = (orders.join(F.broadcast(cust),
                     orders["o_custkey"] == cust["c_custkey"])
         .join(li, li["l_orderkey"] == orders["o_orderkey"]))
    r = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue"))
    return r.orderBy(F.desc("revenue"), "l_orderkey").limit(10)


@_q("v4_tpch_q5", """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
""")
def q_tpch_q5(spark, sf):
    """TPC-H Q5 shape (local supplier volume): six-way star join. The
    three dimensions (supplier, nation, region) broadcast; only the
    fact-fact joins shuffle."""
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load(spark, sf, "lineitem")
    sup = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf, "nation")
    reg = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
         .join(li, li["l_orderkey"] == orders["o_orderkey"])
         .join(F.broadcast(sup),
               (li["l_suppkey"] == sup["s_suppkey"])
               & (cust["c_nationkey"] == sup["s_nationkey"]))
         .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
         .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]))
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue"))


@_q("x24_fuzzy_join", """
WITH clean AS (SELECT p_partkey AS clean_id, p_name AS name FROM part),
 dirty AS (SELECT p_partkey AS dirty_id,
                  substr(p_name, 1, (p_partkey % length(p_name)))
                    || substr(p_name, (p_partkey % length(p_name)) + 2)
                    AS name
           FROM part WHERE p_partkey % 10 = 0)
SELECT d.dirty_id, c.clean_id, d.name AS name, c.name AS name_r
FROM dirty d JOIN clean c
  ON abs(length(d.name) - length(c.name)) <= 1
 AND levenshtein(d.name, c.name) <= 1
""")
def q_fuzzy_join(spark, sf):
    """Entity resolution: part names with one deterministically-deleted
    character joined back to the catalog within edit distance 1 —
    deletion-neighborhood blocking (linear key expansion + equi-join),
    never a cross join. Oracle is the naive levenshtein join."""
    from data_ingest_spark.extensions.fuzzy import fuzzy_join
    part = load(spark, sf, "part")
    clean = part.select(F.col("p_partkey").alias("clean_id"),
                        F.col("p_name").alias("name"))
    dirty = (part.filter(F.col("p_partkey") % 10 == 0)
             .select(F.col("p_partkey").alias("dirty_id"),
                     F.expr("concat(substring(p_name, 1, "
                            "p_partkey % length(p_name)), "
                            "substring(p_name, "
                            "(p_partkey % length(p_name)) + 2))")
                     .alias("name")))
    j = fuzzy_join(dirty, clean, "name")
    return j.select("dirty_id", F.col("clean_id_r").alias("clean_id"),
                    "name", "name_r")


@_q("x90_fuzzy_join2", """
WITH l AS (SELECT c_custkey AS lk, c_name AS ln FROM customer
           WHERE c_custkey % 499 = 0),
 r AS (SELECT c_custkey AS rk, c_name AS rn FROM customer)
SELECT l.lk, r.rk, CAST(levenshtein(l.ln, r.rn) AS INTEGER) AS dist
FROM l JOIN r ON levenshtein(l.ln, r.rn) <= 2 AND l.lk <> r.rk
""")
def q_fuzzy_join2(spark, sf):
    """Edit-distance-2 fuzzy join (the round-3 verdict gap): customer
    names within levenshtein ≤ 2 of a sampled query set via depth-2
    deletion-neighborhood blocking — FastSS keys (1 + n + n(n−1)/2 per
    string) meet in an equi-join, exact levenshtein verifies, never a
    cross join. Oracle is the naive levenshtein join."""
    from data_ingest_spark.extensions.fuzzy import fuzzy_join
    cust = load(spark, sf, "customer")
    left = (cust.filter(F.col("c_custkey") % 499 == 0)
            .select(F.col("c_custkey").alias("lk"),
                    F.col("c_name").alias("name")))
    right = cust.select(F.col("c_custkey").alias("rk"),
                        F.col("c_name").alias("name"))
    j = fuzzy_join(left, right, "name", max_dist=2)
    return (j.filter(F.col("lk") != F.col("rk_r"))
            .select("lk", F.col("rk_r").alias("rk"),
                    F.levenshtein("name", "name_r").cast("int")
                    .alias("dist")))


def _bucket_sql(id_expr: str, seed: int) -> str:
    from data_ingest_spark.extensions.sampling import hash_bucket_sql
    return hash_bucket_sql(id_expr, seed)


@_q("x18_hash_split", f"""
WITH b AS (SELECT lang, {{expr}} AS bkt FROM documents)
SELECT lang,
       CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2
""".format(expr=_bucket_sql("doc_id", 42)))
def q_hash_split(spark, sf):
    """Deterministic 80/10/10 split of documents, counted per language
    — content-addressed assignment, stable under reruns/repartition."""
    from data_ingest_spark.extensions.sampling import hash_split
    docs = load(spark, sf, "documents")
    out = hash_split(docs, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)
    return out.groupBy("lang", "split").agg(F.count("*").alias("n"))


@_q("x19_stratified_sample", f"""
SELECT doc_id, source FROM documents
WHERE {_bucket_sql("doc_id", 7)} < 2000
""")
def q_stratified_sample(spark, sf):
    """Deterministic 20% sample by id hash — exact row set reproduced
    by the oracle, which df.sample cannot promise."""
    from data_ingest_spark.extensions.sampling import stratified_sample
    docs = load(spark, sf, "documents").select("doc_id", "source")
    return stratified_sample(docs, "doc_id", 0.2, seed=7)


@_q("x29_stratified_quota", f"""
WITH h AS (SELECT doc_id, source,
                  {_bucket_sql("doc_id", 42)} AS b
           FROM documents),
 r AS (SELECT doc_id, source,
              ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY b, doc_id) AS rk
       FROM h)
SELECT doc_id, source FROM r WHERE rk <= 5
""")
def q_stratified_quota(spark, sf):
    """Exactly-5-per-source eval draw, content-addressed and layout-
    independent; the oracle replays the same hash order."""
    from data_ingest_spark.extensions.sampling import stratified_quota
    docs = load(spark, sf, "documents").select("doc_id", "source")
    return stratified_quota(docs, "source", k=5, seed=42)


def _profile_col_sql(c: str) -> str:
    return (f"SELECT '{c}' AS \"column\", CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_nulls, "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_value, "
            f"CAST(MAX({c}) AS VARCHAR) AS max_value FROM documents")


@_q("x30_profile",
    " UNION ALL ".join(_profile_col_sql(c)
                       for c in ["doc_id", "text", "lang", "source",
                                 "n_chars"]))
def q_profile(spark, sf):
    """Ingestion data-quality profile of documents: one scan, one row
    per column (nulls / exact distincts / min / max)."""
    from data_ingest_spark.extensions.profile import profile_table
    return profile_table(load(spark, sf, "documents"))


@_q("x31_vocab_topk", """
WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
           FROM documents),
 c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
       FROM t WHERE token <> '' GROUP BY 1)
SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100
""")
def q_vocab_topk(spark, sf):
    """Vocabulary heavy hitters: the canonical wordcount — explode +
    map-side-combined count + TakeOrderedAndProject top-100 with a
    token tie-break."""
    from data_ingest_spark.extensions.text import tokens_col
    docs = load(spark, sf, "documents")
    return (docs.select(F.explode(tokens_col("text")).alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "token").limit(100))


@_q("x60_topk_per_group", """
WITH t AS (SELECT source, unnest(string_split_regex(lower(text), '\\s+'))
                  AS token
           FROM documents),
 c AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
       FROM t WHERE token <> '' GROUP BY 1, 2),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY n DESC, token) AS BIGINT) AS rk
       FROM c)
SELECT source, token, n, rk FROM r WHERE rk <= 10
""")
def q_topk_per_group(spark, sf):
    """Per-GROUP heavy hitters (top tokens per source): the global
    top-k trick doesn't apply, so rank inside a source-partitioned
    window — distributed, no collect, state bounded by k per group."""
    from pyspark.sql import Window as W

    from data_ingest_spark.extensions.text import tokens_col
    docs = load(spark, sf, "documents")
    counts = (docs.select("source",
                          F.explode(tokens_col("text")).alias("token"))
              .filter(F.col("token") != "")
              .groupBy("source", "token").agg(F.count("*").alias("n")))
    w = W.partitionBy("source").orderBy(F.desc("n"), "token")
    return (counts.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= 10))


@_q("e19_session_stats", """
WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
 d AS (SELECT user_id, ts,
              CASE WHEN epoch(ts) - epoch(LAG(ts) OVER
                     (PARTITION BY user_id ORDER BY ts)) > 1800
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                   THEN 1 ELSE 0 END AS brk
       FROM ev),
 s AS (SELECT user_id, ts,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
       FROM d),
 g AS (SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events,
              epoch(MAX(ts)) - epoch(MIN(ts)) AS dur
       FROM s GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       ROUND(AVG(dur), 6) AS avg_session_s,
       ROUND(MAX(dur), 6) AS max_session_s
FROM g GROUP BY 1
""")
def q_session_stats(spark, sf):
    """Batch sessionization via gaps-and-islands (30-min inactivity
    boundary): lag to mark breaks, running sum to number sessions,
    two aggregations for per-user session stats — the batch twin of
    the streaming session_window (e3), one sorted shuffle on user."""
    from pyspark.sql import Window as W

    from data_ingest_spark.functions.stats import epoch_seconds
    ev = events_df(spark, sf).select("user_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts")
    sec = epoch_seconds("ts")
    brk = F.when(F.lag("ts").over(w).isNull()
                 | ((sec - epoch_seconds(F.lag("ts").over(w))) > 1800),
                 1).otherwise(0)
    sess = (ev.withColumn("_brk", brk)
            .withColumn("sess", F.sum("_brk").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    g = (sess.groupBy("user_id", "sess")
         .agg(F.count("*").alias("n_events"),
              (F.max(sec) - F.min(sec)).alias("dur")))
    return (g.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.sum("n_events").alias("n_events"),
                 F.round(F.avg("dur"), 6).alias("avg_session_s"),
                 F.round(F.max("dur"), 6).alias("max_session_s")))


@_q("x32_negative_samples", f"""
WITH n AS (SELECT COUNT(*) AS total FROM embeddings),
 j AS (SELECT vec_id, i AS neg_rank
       FROM embeddings CROSS JOIN UNNEST(range(0, 4)) AS t(i)),
 h AS (SELECT vec_id, neg_rank,
              CAST(concat('0x', substr(md5('13:' || CAST(vec_id AS VARCHAR)
                    || ':' || CAST(neg_rank AS VARCHAR)), 1, 15)) AS BIGINT)
                  % (SELECT total FROM n) AS raw
       FROM j)
SELECT vec_id AS anchor_id, CAST(neg_rank AS BIGINT) AS neg_rank,
       CAST(CASE WHEN raw = vec_id
                 THEN (raw + 1) % (SELECT total FROM n)
                 ELSE raw END AS BIGINT) AS neg_id
FROM h
""")
def q_negative_samples(spark, sf):
    """Contrastive negative mining: 4 deterministic pseudo-random
    negatives per anchor from the contiguous id space (seeded md5 mod
    N, self remapped to the next id) — pure codegen, reproducible
    across engines and reruns."""
    emb = load(spark, sf, "embeddings")
    n = emb.count()
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("13"), F.col("vec_id").cast("string"),
        F.col("neg_rank").cast("string")).cast("binary")), 1, 15),
        16, 10).cast("long") % n
    return (emb.select("vec_id")
            .withColumn("neg_rank",
                        F.explode(F.sequence(F.lit(0), F.lit(3))))
            .select(F.col("vec_id").alias("anchor_id"),
                    F.col("neg_rank").cast("long").alias("neg_rank"),
                    F.when(h == F.col("vec_id"), (h + 1) % n)
                    .otherwise(h).cast("long").alias("neg_id")))


@_q("x33_cap_repetitions", f"""
WITH corpus AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 1000000, text FROM documents
                WHERE doc_id % 5 = 0
                UNION ALL SELECT doc_id + 2000000, text FROM documents
                WHERE doc_id % 10 = 0),
 r AS (SELECT doc_id, md5(text) AS h,
              ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY {_bucket_sql("doc_id", 5)},
                                          doc_id) AS rk
       FROM corpus)
SELECT h AS content_hash, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN rk <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r GROUP BY 1 HAVING COUNT(*) > 1
""")
def q_cap_repetitions(spark, sf):
    """Repetition capping at k=2 over a corpus with planted 2x/3x
    duplicates; reports kept-vs-total per duplicated content."""
    from data_ingest_spark.extensions.dedup import cap_repetitions
    docs = load(spark, sf, "documents").select("doc_id", "text")
    corpus = (docs
              .unionAll(docs.filter(F.col("doc_id") % 5 == 0)
                        .select((F.col("doc_id") + 1000000).alias("doc_id"),
                                "text"))
              .unionAll(docs.filter(F.col("doc_id") % 10 == 0)
                        .select((F.col("doc_id") + 2000000).alias("doc_id"),
                                "text")))
    kept = cap_repetitions(corpus, k=2, seed=5)
    h = F.md5(F.col("text").cast("binary"))
    totals = (corpus.select(h.alias("content_hash"))
              .groupBy("content_hash")
              .agg(F.count("*").alias("n_total"))
              .filter(F.col("n_total") > 1))
    kc = (kept.select(h.alias("content_hash"))
          .groupBy("content_hash").agg(F.count("*").alias("n_kept")))
    return totals.join(kc, "content_hash").select(
        "content_hash", "n_total", "n_kept")


@_q("x26_sequence_packing", """
WITH t AS (SELECT doc_id,
                  len(string_split_regex(lower(text), '\\s+')) AS n_tokens
           FROM documents),
 r AS (SELECT doc_id, n_tokens,
              SUM(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS start_tok
       FROM t),
 s AS (SELECT doc_id, n_tokens,
              CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS seq_id
       FROM r)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM s GROUP BY 1
""")
def q_sequence_packing(spark, sf):
    """Contiguous sequence packing at 2048 tokens/sequence: each doc's
    seq_id = floor(tokens-before-it / budget) via the distributed
    prefix-sum (coarse ranges + offsets — no single-task window),
    summarized per sequence. The oracle is the naive global window."""
    from data_ingest_spark.extensions.packing import pack_sequences
    from data_ingest_spark.extensions.text import tokens_col
    docs = load(spark, sf, "documents").select(
        "doc_id", F.size(tokens_col("text")).alias("n_tokens"))
    packed = pack_sequences(docs, budget=2048, order_col="doc_id",
                            token_col="n_tokens")
    return packed.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"))


@_q("x27_weighted_mix", f"""
WITH w AS (SELECT doc_id, source FROM documents
           WHERE CASE WHEN source IN ('src0','src1','src2','src3','src4')
                      THEN {{b}} < 10000
                      WHEN source IN ('src5','src6','src7') THEN {{b}} < 5000
                      WHEN source IN ('src8','src9') THEN {{b}} < 2500
                      ELSE FALSE END)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1
""".format(b=_bucket_sql("doc_id", 11)))
def q_weighted_mix(spark, sf):
    """Data-mixing recipe: keep 100% of five sources, 50% of three,
    25% of two, drop the rest — content-addressed Bernoulli draws,
    zero shuffles before the count."""
    from data_ingest_spark.extensions.packing import weighted_mix
    docs = load(spark, sf, "documents")
    weights = {f"src{i}": 1.0 for i in range(5)}
    weights.update({f"src{i}": 0.5 for i in range(5, 8)})
    weights.update({f"src{i}": 0.25 for i in range(8, 10)})
    mixed = weighted_mix(docs, weights, seed=11)
    return mixed.groupBy("source").agg(F.count("*").alias("n"))


@_q("x28_chunking", """
WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
 n AS (SELECT doc_id, text,
              GREATEST(1, CAST(CEIL((len - 64) / 448.0) AS INT)) AS nc
       FROM d),
 c AS (SELECT doc_id, i AS chunk_idx, CAST(i * 448 AS BIGINT) AS chunk_start,
              substr(text, i * 448 + 1, 512) AS chunk_text
       FROM n CROSS JOIN UNNEST(range(0, nc)) AS t(i))
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_start,
       chunk_text, CAST(length(chunk_text) AS BIGINT) AS n_chunk_chars
FROM c
""")
def q_chunking(spark, sf):
    """RAG/pretraining chunking: 512-char chunks, 64-char overlap —
    sequence+explode+substring, all codegen, no shuffle, no UDF."""
    return tx.chunk_documents(load(spark, sf, "documents"),
                              size=512, overlap=64)


@_q("x63_chunk_roundtrip", """
WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
 n AS (SELECT doc_id, text,
              GREATEST(1, CAST(CEIL((len - 64) / 448.0) AS INT)) AS nc
       FROM d),
 c AS (SELECT doc_id, i AS chunk_idx,
              substr(text, i * 448 + 1, 512) AS chunk_text
       FROM n CROSS JOIN UNNEST(range(0, nc)) AS t(i)),
 r AS (SELECT doc_id,
              string_agg(CASE WHEN chunk_idx = 0 THEN chunk_text
                              ELSE substr(chunk_text, 65) END, ''
                         ORDER BY chunk_idx) AS text
       FROM c GROUP BY 1)
SELECT r.doc_id,
       CAST(CASE WHEN r.text = d.text THEN 1 ELSE 0 END AS BIGINT)
       AS roundtrip_ok,
       CAST(length(r.text) AS BIGINT) AS n_chars_rebuilt
FROM r JOIN d ON d.doc_id = r.doc_id
""")
def q_chunk_roundtrip(spark, sf):
    """Chunk → reassemble roundtrip audit: every document rebuilds
    byte-identically from its 512/64 chunks (roundtrip_ok = 1 for all
    rows) — the storage-safety guarantee for chunk-only pipelines."""
    docs = load(spark, sf, "documents")
    back = tx.reassemble_chunks(
        tx.chunk_documents(docs, size=512, overlap=64), overlap=64)
    return (back.withColumnRenamed("text", "_rt")
            .join(docs.select("doc_id", "text"), "doc_id")
            .select("doc_id",
                    (F.col("_rt") == F.col("text")).cast("long")
                    .alias("roundtrip_ok"),
                    F.length("_rt").cast("long").alias("n_chars_rebuilt")))


@_q("x25_audio_features", """
WITH b AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx FROM documents),
 s AS (SELECT doc_id, i,
              CAST(concat('0x', substr(hx, 2 * i - 1, 2)) AS INT) AS byte
       FROM b CROSS JOIN UNNEST(range(1, length(hx) // 2 + 1)) AS t(i)),
 l AS (SELECT doc_id, byte,
              LEAD(byte) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
       FROM s)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       ROUND(AVG(byte), 6) AS mean_level,
       ROUND(sqrt(AVG((byte - 128.0) * (byte - 128.0))), 6) AS rms,
       ROUND(SUM(CASE WHEN (byte - 128.0) * (nxt - 128.0) < 0
                      THEN 1 ELSE 0 END) / (COUNT(*) - 1.0), 6) AS zcr
FROM l GROUP BY doc_id
""")
def q_audio_features(spark, sf):
    """Audio stage plumbing with a full value oracle: payload bytes as
    8-bit PCM → mean level / RMS / zero-crossing rate via the numpy
    mapInPandas kernel. Byte sums are integer-valued doubles, so both
    engines agree exactly despite different summation orders."""
    docs = load(spark, sf, "documents").withColumn(
        "payload", F.col("text").cast("binary"))
    return mm.audio_features(docs)


