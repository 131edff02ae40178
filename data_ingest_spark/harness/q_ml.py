"""ML stage: doublets, PCA/eigen, MNN integrate, kNN/SNN, clustering (LPA/Louvain), embeddings, graph ops, QC pipelines.

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
from data_ingest_spark.harness.registry import events_df  # noqa: E402
from data_ingest_spark.harness.q_extensions import (_DUP_SQL, _dup_corpus,  # noqa: E402
                                                    _shingle_ctes)

# ------------------------------------------------- M: ML stage (M2, M8–M13, pipeline)
#
# The deterministic graph ops (kNN, SNN) run on the embeddings table and
# carry full DuckDB oracles. The inherently iterative/eigen ops (PCA,
# LPA/Louvain, spectral embedding, MNN integration, doublet simulation)
# are seeded+deterministic but not ANSI-SQL-expressible → rows-only.


def _emb_pc_arr(spark, sf):
    """embeddings as a reduced-space table: sample=label,
    barcode=vec_id, pc=float64 array."""
    return load(spark, sf, "embeddings").select(
        F.col("label").cast("string").alias("sample"),
        F.col("vec_id").cast("string").alias("barcode"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pc"))


def _emb_knn(spark, sf, k: int = 10, cached: bool = False):
    """Shared exact-kNN edge list over the embeddings table. The
    staged reduced matrix is keyed by (sf dir, file mtime, size), so
    the whole kNN → SNN → clustering/embedding family stages it ONCE
    per dataset instead of once per query, while a regenerated input
    file invalidates the key.

    ``cached=True`` additionally materializes the EDGE LIST itself
    under the same content key (neighbors.knn_exact_cached — the
    Seurat ``@graphs`` pattern): consumers of the graph (SNN,
    clustering, PageRank, spectral) read the one staged copy instead
    of re-scoring the matrix per query. The producer query
    (m12_knn_exact) deliberately does NOT use it, so its benchmark
    number measures the scoring throughput, not a parquet scan."""
    import os
    from data_ingest_spark.operators import neighbors as nb
    try:
        st = os.stat(os.path.join(sf, "embeddings.parquet"))
        key = f"embpc_{sf}_{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        key = None
    if cached:
        return nb.knn_exact_cached(_emb_pc_arr(spark, sf), k=k,
                                   id_cols=("barcode",), stage_key=key)
    return nb.knn_exact(_emb_pc_arr(spark, sf), k=k, id_cols=("barcode",),
                        stage_key=key)


def _emb_snn_scaled(spark, sf, k: int = 10):
    """Scaled SNN edge list staged PER SESSION under the embeddings
    content key — the second half of the Seurat ``@graphs`` pattern
    (FindNeighbors stores both the kNN and the pruned SNN graph on the
    object; configureEmbedding.r:111-115). The clustering consumers
    (LPA, distributed Louvain) read the one staged copy; the producer
    query (m12_snn_graph) deliberately does NOT use it, so its bench
    number keeps measuring the SNN self-join itself. The stage path
    embeds the Spark application id, so nothing is reused across
    bench/oracle invocations — every run computes from the parquet
    inputs."""
    import os
    from data_ingest_spark.operators import neighbors as nb
    from data_ingest_spark.operators import staging
    knn = _emb_knn(spark, sf, k=k, cached=True)
    snn = nb.snn_graph(knn, k=k).withColumn(
        "snn_weight",
        F.round(F.col("snn_weight") * _LPA_SCALE).cast("double"))
    try:
        st = os.stat(os.path.join(sf, "embeddings.parquet"))
        key = f"embsnn_{sf}_{st.st_mtime_ns}_{st.st_size}"
    except OSError:
        return snn
    path = f"{staging.stage_dir(spark, 'snn_stage_', key)}/snn_k{k}.parquet"
    if not staging.path_exists(spark, f"{path}/_SUCCESS"):
        snn.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _emb_pc_cols(spark, sf, dim: int = 64):
    emb = _emb_pc_arr(spark, sf)
    cols = [F.col("pc").getItem(i).alias(f"pc_{i}") for i in range(dim)]
    return emb.select("sample", "barcode", *cols)


_KNN_EDGES_SQL = """
v AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding::DOUBLE[] AS e
      FROM embeddings),
 s AS (SELECT a.id AS src, b.id AS dst,
              ROUND(list_dot_product(a.e, b.e)
                    / (sqrt(list_dot_product(a.e, a.e))
                       * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
       FROM v a CROSS JOIN v b WHERE a.id <> b.id),
 r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY src
                      ORDER BY cosine DESC, dst) AS BIGINT) AS rank
       FROM s)"""


@_q("m12_knn_exact", f"""
WITH {_KNN_EDGES_SQL}
SELECT src, dst, cosine, rank FROM r WHERE rank <= 10
""")
def q_knn_exact(spark, sf):
    from data_ingest_spark.operators import neighbors as nb
    return _emb_knn(spark, sf, k=10)


@_q("m12_snn_graph", f"""
WITH {_KNN_EDGES_SQL},
 e AS (SELECT src, dst FROM r WHERE rank <= 10),
 i AS (SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS c
       FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
       GROUP BY 1, 2)
SELECT u AS src, v AS dst, ROUND(c / (20.0 - c), 9) AS snn_weight
FROM i WHERE c / (20.0 - c) >= 1.0 / 15.0
""")
def q_snn_graph(spark, sf):
    from data_ingest_spark.operators import neighbors as nb
    knn = _emb_knn(spark, sf, k=10, cached=True)
    snn = nb.snn_graph(knn, k=10)
    return snn.withColumn("snn_weight", F.round("snn_weight", 9))


# LPA vote sums must compare identically in Spark and DuckDB, so the
# SNN weight c/(20−c) is scaled by LCM(10..19) = 232792560 to an EXACT
# int64 — float summation order can flip a >= at the last ulp, integer
# sums cannot. (c ∈ 1..10 ⇒ 20−c ∈ 10..19 divides the LCM; sums stay
# far below 2^53 so double-held integers remain exact.)
_LPA_SCALE = 232792560


def _lpa_oracle_sql(iters: int = 5) -> str:
    sql = f"""
WITH {_KNN_EDGES_SQL},
 e AS (SELECT src, dst FROM r WHERE rank <= 10),
 i AS (SELECT a.src AS u, b.src AS v, COUNT(*) AS c
       FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
       GROUP BY 1, 2),
 sn AS (SELECT u, v, CAST(c * ({_LPA_SCALE} // (20 - c)) AS BIGINT) AS w
        FROM i WHERE c / (20.0 - c) >= 1.0 / 15.0),
 und AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM sn
         UNION ALL SELECT v, u, w FROM sn),
 l0 AS MATERIALIZED (
   SELECT src AS id, src AS label FROM (SELECT DISTINCT src FROM und))"""
    # MATERIALIZED is load-bearing: und is referenced every round and
    # l{k} twice per round — inlined, the plan doubles each level
    # (2^iters copies of the all-pairs kNN subtree; observed OOM at
    # sf0.1). Materialization keeps the oracle linear in iters.
    for k in range(iters):
        sql += f""",
 v{k} AS (SELECT e.src, l.label AS nl, SUM(e.w) AS w
          FROM und e JOIN l{k} l ON e.dst = l.id GROUP BY 1, 2),
 b{k} AS (SELECT src, MIN(nl) AS new FROM (
            SELECT src, nl, w, MAX(w) OVER (PARTITION BY src) AS mw
            FROM v{k}) t
          WHERE w >= mw GROUP BY src),
 l{k + 1} AS MATERIALIZED (
   SELECT l.id, COALESCE(b.new, l.label) AS label
   FROM l{k} l LEFT JOIN b{k} b ON l.id = b.src)"""
    return sql + f"\nSELECT id, label AS cluster FROM l{iters}"


@_q("m13_label_propagation", _lpa_oracle_sql(5))
def q_label_propagation(spark, sf):
    """Weighted LPA, 5 rounds, integer-scaled votes (see _LPA_SCALE).
    Fully oracle-checked: the DuckDB side unrolls the same 5 rounds."""
    from data_ingest_spark.operators import clustering as cl
    return cl.label_propagation(_emb_snn_scaled(spark, sf, k=10),
                                max_iter=5)


def _pagerank_oracle_sql(iters: int = 5) -> str:
    t = "1000000000000"
    sql = f"""
WITH {_KNN_EDGES_SQL},
 e AS (SELECT DISTINCT src, dst FROM r WHERE rank <= 10),
 deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
 ew AS (SELECT e.src, e.dst, d.outdeg FROM e JOIN deg d ON e.src = d.src),
 nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
 nn AS (SELECT COUNT(*) AS n FROM nodes),
 p0 AS (SELECT id, CAST({t} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"""
    for k in range(iters):
        sql += f""",
 c{k} AS (SELECT ew.dst, SUM(p.r // ew.outdeg) AS s
          FROM ew JOIN p{k} p ON ew.src = p.id GROUP BY 1),
 p{k + 1} AS (SELECT nodes.id,
                     CAST(({t} * 15) // (100 * nn.n)
                          + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
              FROM nodes CROSS JOIN nn
              LEFT JOIN c{k} c ON nodes.id = c.dst)"""
    return sql + f"""
SELECT id, r AS rank_int, ROUND(r / 1000000000000.0, 9) AS rank
FROM p{iters}"""


@_q("g1_pagerank", _pagerank_oracle_sql(5))
def q_pagerank(spark, sf):
    """Integer fixed-point PageRank, 5 rounds, over the directed k=10
    kNN graph of the embeddings table. Exact-int arithmetic makes the
    iterative ranks themselves hash-checkable (see operators/graph.py);
    the oracle unrolls the same rounds in DuckDB."""
    from data_ingest_spark.operators import neighbors as nb
    from data_ingest_spark.operators.graph import pagerank
    knn = _emb_knn(spark, sf, k=10, cached=True)
    return pagerank(knn.select("src", "dst"), max_iter=5)


@_q("g2_triangles", f"""
WITH {_KNN_EDGES_SQL},
 d AS (SELECT src, dst FROM r WHERE rank <= 10),
 u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM d),
 tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM u e1 JOIN u e2 ON e1.b = e2.a
         JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM tri
""")
def q_triangles(spark, sf):
    """Triangle count on the undirected kNN graph: canonical-order
    edges (a<b) joined twice — the standard distributed formulation;
    each join keys on a vertex so the shuffle is by node, and the
    ordering ensures each triangle counts exactly once."""
    from data_ingest_spark.operators import neighbors as nb
    knn = _emb_knn(spark, sf, k=10, cached=True)
    u = (knn.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
         .distinct())
    e1 = u.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = u.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = u.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("n_triangles"))


# (m13_louvain — the driver-side Louvain — and m10_spectral_dist —
# the distributed power-iteration Laplacian eigenmap — were retired
# from the registry in round 7 per the round-6 verdict ask #4 (the
# m6_vst pattern): each was a rows-only DECLARATION duplicating a
# driver-green value-oracled sibling (m13_louvain_dist pins the same
# clustering with a full unrolled-Jacobi oracle; the spectral scale
# path is deterministic but irreducibly iterative, so it could never
# graduate past rows-only). The operators themselves are unchanged —
# clustering.louvain_driver and embedding.spectral_embedding_distributed
# stay under tests/test_ml_pipeline.py's planted-cliques property
# tests (louvain_distributed_matches_driver_on_separated_cliques,
# spectral_embedding_distributed_separates_cliques).


def _louvain_oracle_sql(iters: int = 8) -> str:
    """Unrolled Jacobi-parallel Louvain phase 1 (resolution 0.5) over
    the integer-scaled SNN graph. Weights/degrees are exact
    float64-held integers, so the gain ``w − ((0.5·deg)·cdeg)/m2``
    (the Spark op order) is bit-identical across engines; colors come
    from the shared md5 parity."""
    sql = f"""
WITH {_KNN_EDGES_SQL},
 e AS (SELECT src, dst FROM r WHERE rank <= 10),
 i AS (SELECT a.src AS u, b.src AS v, COUNT(*) AS c
       FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
       GROUP BY 1, 2),
 sn AS (SELECT u, v, CAST(c * ({_LPA_SCALE} // (20 - c)) AS DOUBLE) AS w
        FROM i WHERE c / (20.0 - c) >= 1.0 / 15.0),
 und AS MATERIALIZED (SELECT u AS src, v AS dst, w FROM sn
         UNION ALL SELECT v, u, w FROM sn),
 dg AS MATERIALIZED (SELECT src AS id, SUM(w) AS deg FROM und GROUP BY 1),
 mm AS (SELECT SUM(deg) AS m2 FROM dg),
 lab0 AS MATERIALIZED (
   SELECT id, id AS comm, deg,
          CAST(concat('0x', substr(md5(id), 1, 8)) AS BIGINT) % 2 AS h
   FROM dg)"""
    for k in range(iters):
        sql += f""",
 cd{k} AS (SELECT comm, SUM(deg) AS cdeg FROM lab{k} GROUP BY 1),
 nw{k} AS (SELECT e.src AS id, l.comm AS nc, SUM(e.w) AS w
           FROM und e JOIN lab{k} l ON e.dst = l.id GROUP BY 1, 2),
 g{k} AS (SELECT n.id, n.nc,
                n.w - ((0.5 * l.deg) * (CASE WHEN n.nc = l.comm
                       THEN c.cdeg - l.deg ELSE c.cdeg END)) / m.m2
                  AS gain
          FROM nw{k} n JOIN lab{k} l ON n.id = l.id
               JOIN cd{k} c ON c.comm = n.nc
               CROSS JOIN mm m
          WHERE l.h = {k % 2}),
 b{k} AS (SELECT id, nc FROM (
            SELECT id, nc, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY gain DESC, nc) AS rk
            FROM g{k} WHERE gain > 1e-12) WHERE rk = 1),
 lab{k + 1} AS MATERIALIZED (
   SELECT l.id, COALESCE(b.nc, l.comm) AS comm, l.deg, l.h
   FROM lab{k} l LEFT JOIN b{k} b ON l.id = b.id)"""
    return sql + f"""
, rep AS (SELECT comm, MIN(id) AS cluster FROM lab{iters} GROUP BY 1)
SELECT l.id, r.cluster FROM lab{iters} l JOIN rep r ON l.comm = r.comm"""


@_q("m13_louvain_dist", _louvain_oracle_sql(8))
def q_louvain_dist(spark, sf):
    """Distributed Louvain phase 1 (Jacobi-parallel moves) under a
    FULL value oracle: the SQL unrolls the same 8 alternating-color
    rounds on the integer-scaled SNN graph (see _LPA_SCALE — exact
    float64 integers make the modularity gains bit-identical). The
    scale path for FindClusters(algorithm=1)."""
    from data_ingest_spark.operators import clustering as cl
    return cl.louvain_distributed(_emb_snn_scaled(spark, sf, k=10),
                                  resolution=0.5, max_iter=8)


# (m2_doublet_scores — the applyInPandas small-sample fallback twin —
# was retired from the registry in round 5: m2_doublets_native is the
# oracled default and the fallback stays covered by
# tests/test_ml_pipeline.py's property tests.)


@_q("m2_doublets_native", f"""
WITH expr AS ({_EXPR_SQL}),
 c AS (SELECT sample, barcode, SUM(cnt) AS tot, COUNT(*) AS nf
       FROM expr GROUP BY 1, 2),
 nb AS (SELECT sample, GREATEST(1, COUNT(*) // 128) AS nbk
        FROM expr GROUP BY 1),
 ob AS (SELECT c.sample, c.barcode,
               CAST(concat('0x', substr(md5(CAST(c.barcode AS VARCHAR)),
                                        1, 8)) AS BIGINT) % nb.nbk AS bkt
        FROM c JOIN nb ON nb.sample = c.sample),
 o AS (SELECT sample, barcode, bkt,
              ROW_NUMBER() OVER (PARTITION BY sample, bkt
                ORDER BY md5(CAST(barcode AS VARCHAR)),
                         CAST(barcode AS VARCHAR)) - 1 AS rn
       FROM ob),
 asg AS (SELECT sample, barcode,
                CAST(bkt AS VARCHAR) || '_' || CAST(rn // 2 AS VARCHAR)
                AS pid FROM o),
 fullp AS (SELECT sample, pid FROM asg GROUP BY 1, 2 HAVING COUNT(*) = 2),
 simg AS (SELECT a.sample, a.pid, e.gene, SUM(e.cnt) AS c2
          FROM expr e JOIN asg a ON e.sample = a.sample
                                AND e.barcode = a.barcode
               JOIN fullp f ON f.sample = a.sample AND f.pid = a.pid
          GROUP BY 1, 2, 3),
 sim AS (SELECT sample, pid, SUM(c2) AS tot, COUNT(*) AS nf
         FROM simg GROUP BY 1, 2),
 pts AS (SELECT sample, 0 AS lbl,
                CAST(FLOOR(ln(1.0 + tot) * 1000000 + 0.5) AS BIGINT) AS f1,
                CAST(FLOOR(ln(1.0 + nf) * 1000000 + 0.5) AS BIGINT) AS f2
         FROM c
         UNION ALL
         SELECT sample, 1,
                CAST(FLOOR(ln(1.0 + tot) * 1000000 + 0.5) AS BIGINT),
                CAST(FLOOR(ln(1.0 + nf) * 1000000 + 0.5) AS BIGINT)
         FROM sim),
 ptw AS (SELECT sample, f1, f2,
                SUM(CASE WHEN lbl = 0 THEN 1 ELSE 0 END) AS m0,
                SUM(lbl) AS m1,
                f1 // 500000 AS gx, f2 // 500000 AS gy
         FROM pts GROUP BY 1, 2, 3),
 q AS (SELECT p.sample, p.f1 AS qf1, p.f2 AS qf2,
              p.gx + o.dx AS gx, p.gy + o.dy AS gy
       FROM ptw p CROSS JOIN (VALUES (-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)) o(dx, dy)
       WHERE p.m0 > 0),
 cnd AS (SELECT q.sample, q.qf1, q.qf2, n.f1, n.f2,
                n.m0 - CASE WHEN n.f1 = q.qf1 AND n.f2 = q.qf2
                            THEN 1 ELSE 0 END AS m0a,
                n.m1,
                (q.qf1 - n.f1) * (q.qf1 - n.f1)
                + (q.qf2 - n.f2) * (q.qf2 - n.f2) AS d2
         FROM q JOIN ptw n ON n.sample = q.sample AND n.gx = q.gx
                          AND n.gy = q.gy),
 cl AS (SELECT sample, qf1, qf2, f1, f2, d2, m0a, m1, m0a + m1 AS m
        FROM cnd WHERE m0a + m1 > 0),
 tk AS (SELECT *, LEAST(m, GREATEST(0, 10 - (SUM(m) OVER
                  (PARTITION BY sample, qf1, qf2
                   ORDER BY d2, f1, f2
                   ROWS UNBOUNDED PRECEDING) - m))) AS take
        FROM cl),
 sc AS (SELECT sample, qf1, qf2,
               SUM(GREATEST(0, take - m0a)) * 1.0 / SUM(take) AS score
        FROM tk GROUP BY 1, 2, 3)
SELECT c.sample, c.barcode,
       COALESCE(ROUND(sc.score, 6), 0.0) AS doublet_scores,
       CASE WHEN COALESCE(sc.score, 0.0) > 0.25 THEN 'doublet'
            ELSE 'singlet' END AS doublet_class
FROM c LEFT JOIN sc ON sc.sample = c.sample
  AND sc.qf1 = CAST(FLOOR(ln(1.0 + c.tot) * 1000000 + 0.5) AS BIGINT)
  AND sc.qf2 = CAST(FLOOR(ln(1.0 + c.nf) * 1000000 + 0.5) AS BIGINT)
""")
def q_doublets_native(spark, sf):
    """M2 v2 — distributed, derandomized doublet scoring with a FULL
    value oracle (hash-paired simulated doublets + grid-bucketed kNN
    vote; every stage shuffle-bounded DataFrame ops)."""
    from data_ingest_spark.operators import doublets as db
    return db.doublet_scores_grid(expr_df(spark, sf))


# (m8_pca, m9_integrate_mnn and m9_integrate_mnn_dist were retired
# from the registry in round 7 per the round-6 verdict ask #4 (the
# m6_vst pattern): rows-only declarations whose operators are pinned
# by driver-green value-oracled siblings — x99_power_pc1 verifies the
# PCA eigen-direction end-to-end with a fixed-iteration full oracle,
# and m9_integrate_exact below replays the exact-MNN anchor search,
# weighting and correction against a full DuckDB oracle. The
# operators are unchanged: reduction.run_pca stays under
# tests/test_ml_pipeline.py::test_pca_pipeline, integrate.integrate_mnn
# under test_integrate_mnn_reduces_batch_shift, and the LSH
# distributed variant under test_integrate_mnn_distributed_matches_v1,
# which asserts it MATCHES the exact path within tolerance.)


_M9_DIMS_T = "(SELECT UNNEST(range(1, 65)) AS i) t"


@_q("m9_integrate_exact", f"""
WITH p AS (SELECT CAST(label AS VARCHAR) AS sample,
                  CAST(vec_id AS VARCHAR) AS cb,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv,
                  list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                    AS cq
           FROM embeddings),
 rs AS (SELECT MIN(sample) AS r FROM p),
 ref AS (SELECT p.* FROM p, rs WHERE p.sample = rs.r),
 qry AS MATERIALIZED (SELECT p.* FROM p, rs WHERE p.sample <> rs.r),
 cr AS (SELECT q.sample, q.cb AS qb, q.cv AS qv, r.cb AS rb, r.cv AS rv,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> (q.cq[i] - r.cq[i]) * (q.cq[i] - r.cq[i])))
                    AS BIGINT) AS d2
        FROM qry q CROSS JOIN ref r),
 rk AS (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY sample, qb
                                  ORDER BY d2, rb) AS ra,
               ROW_NUMBER() OVER (PARTITION BY sample, rb
                                  ORDER BY d2, qb) AS rb_
        FROM cr),
 anc AS MATERIALIZED (
   SELECT sample, qb || '|' || rb AS aid,
          list_transform(qv,
            x -> CAST(round(x * 1000000) AS BIGINT)) AS aq,
          list_transform(range(1, 65), i -> rv[i] - qv[i]) AS corr
   FROM rk WHERE ra <= 5 AND rb_ <= 5),
 nr AS (SELECT q.sample, q.cb, a.aid, a.corr,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> (q.cq[i] - a.aq[i]) * (q.cq[i] - a.aq[i])))
                    AS BIGINT) AS da
        FROM qry q JOIN anc a USING (sample)),
 nk AS (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY sample, cb
                                  ORDER BY da, aid) AS rk2,
               CAST(1.0 AS DOUBLE)
                 / (CAST(1.0 AS DOUBLE)
                    + CAST(da AS DOUBLE) / CAST(1e12 AS DOUBLE)) AS w
        FROM nr),
 kept AS MATERIALIZED (SELECT * FROM nk WHERE rk2 <= 10),
 sw AS (SELECT sample, cb,
               list_reduce(list(w ORDER BY da, aid),
                           (a, b) -> a + b) AS sumw
        FROM kept GROUP BY 1, 2),
 cm AS (SELECT sample, cb, t.i AS d1,
               list_reduce(list(corr[t.i] * w ORDER BY da, aid),
                           (a, b) -> a + b) AS sc
        FROM kept CROSS JOIN {_M9_DIMS_T}
        GROUP BY 1, 2, 3),
 corr2 AS (SELECT c.sample, c.cb, c.d1, c.sc / s.sumw AS m
           FROM cm c JOIN sw s USING (sample, cb)),
 qd AS (SELECT sample, cb, t.i AS d1, cv[t.i] AS v
        FROM qry CROSS JOIN {_M9_DIMS_T}),
 outq AS (SELECT q.sample, q.cb AS barcode,
                 CAST(q.d1 - 1 AS INTEGER) AS dim,
                 ROUND(CASE WHEN c.m IS NOT NULL THEN q.v + c.m
                       ELSE q.v END, 6) + CAST(0.0 AS DOUBLE) AS value
          FROM qd q LEFT JOIN corr2 c
            ON c.sample = q.sample AND c.cb = q.cb AND c.d1 = q.d1),
 outr AS (SELECT sample, cb AS barcode, CAST(t.i - 1 AS INTEGER) AS dim,
                 ROUND(cv[t.i], 6) + CAST(0.0 AS DOUBLE) AS value
          FROM ref CROSS JOIN {_M9_DIMS_T})
SELECT * FROM outr UNION ALL SELECT * FROM outq
""")
def q_integrate_exact(spark, sf):
    """M9 under a FULL value oracle: the complete MNN integration
    semantics (mutual-k anchors → inverse-squared-distance-weighted
    corrections → per-cell shift) with integer-exact distances and
    array_sort-pinned float folds, per-dimension output rows. The
    oracle replays anchor search, weighting, and correction; the LSH
    variant (m9_integrate_mnn_dist) remains the past-broadcast-range
    path."""
    from data_ingest_spark.operators import integrate as ig
    return ig.integrate_mnn_exact(_emb_pc_arr(spark, sf))


# (m10_spectral_embedding and m11_tsne were retired from the registry
# in round 7 per the round-6 verdict ask #4 (the m6_vst pattern):
# the real kernels (umap-learn / sklearn TSNE,
# /root/reference/src/QC_helpers/configureEmbedding.r:73-100) are
# environment-blocked in this container, and the deterministic
# spectral fallback both aliases ran is irreducibly iterative — it
# could never graduate past a rows-only declaration. The operators
# are unchanged: embedding.spectral_embedding and embedding.embed_tsne
# stay under tests/test_ml_pipeline.py
# (test_spectral_embedding_shape_and_determinism,
# test_umap_tsne_fallback_to_spectral); the distributed scale path is
# property-tested by test_spectral_embedding_distributed_separates_cliques.)


@_q("x58_dedup_keep_best", f"""
WITH corpus AS ({_DUP_SQL}),
 sc AS (SELECT doc_id, CAST((doc_id * 37) % 101 AS DOUBLE) AS score,
               md5(text) AS h
        FROM corpus),
 rk AS (SELECT doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY score DESC, doc_id ASC) AS rn
        FROM sc)
SELECT doc_id, score FROM rk WHERE rn = 1
""")
def q_dedup_keep_best(spark, sf):
    """Survivorship-policy dedup: keep the highest-scoring copy per
    content hash (deterministic tiebreak), exercised on the planted
    duplicate corpus with a synthetic per-copy score."""
    corpus = _dup_corpus(spark, sf).withColumn(
        "score", ((F.col("doc_id") * 37) % 101).cast("double"))
    return dd.dedup_keep_best(corpus, "score").select("doc_id", "score")


@_q("p2_qc_filters", """
WITH cells AS (
  SELECT l_returnflag AS sample, l_orderkey AS barcode,
         SUM(l_quantity) AS ncount,
         CAST(COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS BIGINT)
           AS nfeature,
         SUM(CASE WHEN l_partkey % 50 = 0 THEN l_quantity ELSE 0 END)
           / SUM(l_quantity) AS fmt
  FROM lineitem GROUP BY 1, 2)
SELECT sample, barcode, ncount, nfeature, ROUND(fmt, 9) AS fraction_mt
FROM cells WHERE ncount >= 30 AND fmt <= 0.2
""")
def q_qc_filters(spark, sf):
    """The ORCHESTRATION layer under a full value oracle: assemble_cells
    → step chain (cellSize → mito → classifier-no-op) through run_qc's
    Experiment/subset_cells machinery. All-integer sums make the
    fraction comparisons engine-exact, so unlike p1 (which includes
    eigen/RNG stages) this path hash-matches DuckDB."""
    from data_ingest_spark.pipeline import Experiment, assemble_cells, run_qc
    expr = expr_df(spark, sf)
    genes = expr.select("gene").distinct().withColumn(
        "name",
        F.when(F.col("gene") % 50 == 0,
               F.concat(F.lit("MT-"), F.col("gene")))
        .otherwise(F.concat(F.lit("G"), F.col("gene"))))
    cells = assemble_cells(expr, genes=genes)
    exp = Experiment(expression=expr, cells=cells, genes=genes)
    final, _ = run_qc(exp, {
        "cellSizeDistribution": {"minCellSize": 30.0},
        "mitochondrialContent": {"maxFraction": 0.2},
    }, order=["cellSizeDistribution", "mitochondrialContent", "classifier"])
    return final.cells.select(
        "sample", "barcode",
        F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("nFeature_RNA").cast("long").alias("nfeature"),
        F.round("fraction_mt", 9).alias("fraction_mt"))


def _p1_oracle_sql(nfeat: int = 64, lpa_iters: int = 5) -> str:
    """Full-value oracle for the end-to-end QC chain: size/mito
    filters → (doublet gate, output-invariant at threshold 1.0) →
    LogNormalize → vst-quad HVG top-N → ScaleData → scaled-HVG
    reduced space → exact cosine kNN(10) → SNN Jaccard prune →
    fixed-point LPA. Composed verbatim from the per-step oracles
    (p2 cells, m5, m6_vst_quad, m7, m12, m13's LPA rounds)."""
    sql = f"""
WITH expr AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                     l_partkey AS gene, l_quantity AS cnt
              FROM lineitem WHERE l_orderkey % 20 = 0),
 cells0 AS (SELECT sample, barcode, SUM(cnt) AS ncount,
                   CAST(COUNT(CASE WHEN cnt > 0 THEN 1 END) AS BIGINT)
                     AS nfeature,
                   SUM(CASE WHEN gene % 50 = 0 THEN cnt ELSE 0 END)
                     / SUM(cnt) AS fmt
            FROM expr GROUP BY 1, 2),
 kept AS MATERIALIZED (SELECT sample, barcode, ncount, nfeature
          FROM cells0 WHERE ncount >= 30 AND fmt <= 0.2),
 fx AS MATERIALIZED (SELECT e.sample, e.barcode, e.gene, e.cnt
       FROM expr e JOIN kept k
         ON e.sample = k.sample AND e.barcode = k.barcode),
 nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM kept),
 g AS (SELECT gene, SUM(cnt) AS s, SUM(cnt * cnt) AS ss FROM fx GROUP BY 1),
 mom AS (SELECT gene, s / n AS mean, (ss - s * s / n) / (n - 1.0) AS variance,
                n FROM g, nc),
 pos AS (SELECT gene, mean, variance, n,
                log10(mean) AS x, log10(variance) AS y
         FROM mom WHERE variance > 0.0),
 xm AS (SELECT AVG(x) AS xm FROM pos),
 pu AS (SELECT pos.*, x - xm AS u FROM pos, xm),
 sums AS (SELECT CAST(COUNT(*) AS DOUBLE) AS s0, SUM(u) AS s1,
                 SUM(u * u) AS s2, SUM(u * u * u) AS s3,
                 SUM(u * u * u * u) AS s4, SUM(y) AS sy,
                 SUM(u * y) AS suy, SUM(u * u * y) AS su2y
          FROM pu),
 coef AS (SELECT
   (s0*(s2*s4-s3*s3) - s1*(s1*s4-s2*s3) + s2*(s1*s3-s2*s2)) AS det,
   (sy*(s2*s4-s3*s3) - s1*(suy*s4-su2y*s3) + s2*(suy*s3-su2y*s2)) AS n0,
   (s0*(suy*s4-su2y*s3) - sy*(s1*s4-s2*s3) + s2*(s1*su2y-s2*suy)) AS n1,
   (s0*(s2*su2y-s3*suy) - s1*(s1*su2y-s3*sy) + sy*(s1*s3-s2*s2)) AS n2
   FROM sums),
 fit AS (SELECT pu.gene, pu.mean, pu.n,
                sqrt(power(10.0, (c.n0 / c.det) + (c.n1 / c.det) * pu.u
                                 + (c.n2 / c.det) * pu.u * pu.u)) AS sd_exp
         FROM pu, coef c),
 pg AS (SELECT e.gene,
               SUM(LEAST(sqrt(f.n), (e.cnt - f.mean) / f.sd_exp)
                   * LEAST(sqrt(f.n), (e.cnt - f.mean) / f.sd_exp)) AS s_nz,
               CAST(COUNT(*) AS DOUBLE) AS nnz,
               ANY_VALUE(f.mean) AS mean, ANY_VALUE(f.sd_exp) AS sd_exp,
               ANY_VALUE(f.n) AS n
        FROM fx e JOIN fit f ON e.gene = f.gene GROUP BY 1),
 sv AS (SELECT gene,
               ROUND((s_nz + (n - nnz) * (mean / sd_exp) * (mean / sd_exp))
                     / (n - 1.0), 6) AS r
        FROM pg),
 hvg AS MATERIALIZED (SELECT gene FROM sv ORDER BY r DESC, gene
                      LIMIT {nfeat}),
 gi AS MATERIALIZED (SELECT gene,
        CAST(ROW_NUMBER() OVER (ORDER BY gene) AS INTEGER) - 1 AS gidx
       FROM hvg),
 tot AS (SELECT sample, barcode, SUM(cnt) AS t FROM fx GROUP BY 1, 2),
 hn AS (SELECT e.sample, e.barcode, e.gene,
               ln(1.0 + e.cnt / t.t * 10000.0) AS v
        FROM fx e JOIN tot t
          ON e.sample = t.sample AND e.barcode = t.barcode
        JOIN hvg h ON e.gene = h.gene),
 st AS (SELECT gene, SUM(v) AS sv2, SUM(v * v) AS ssv FROM hn GROUP BY 1),
 mo AS (SELECT gene, sv2 / n AS mu,
               sqrt((ssv - sv2 * sv2 / n) / (n - 1.0)) AS sd
        FROM st, nc),
 sc AS (SELECT hn.sample, hn.barcode, hn.gene,
               CASE WHEN mo.sd <= 0.0 THEN 0.0
                    ELSE LEAST(10.0, (hn.v - mo.mu) / mo.sd) END AS scaled
        FROM hn JOIN mo ON hn.gene = mo.gene),
 ssum AS (SELECT sample, barcode, gene, SUM(scaled) AS sv3
          FROM sc GROUP BY 1, 2, 3),
 vcell AS (SELECT DISTINCT sample, barcode FROM sc),
 vec AS MATERIALIZED (
   SELECT c.sample || '_' || CAST(c.barcode AS VARCHAR) AS id,
          list(COALESCE(s.sv3, 0.0) ORDER BY g.gidx) AS v
   FROM vcell c CROSS JOIN gi g
   LEFT JOIN ssum s ON s.sample = c.sample AND s.barcode = c.barcode
                   AND s.gene = g.gene
   GROUP BY 1),
 s2c AS (SELECT a.id AS src, b.id AS dst,
               ROUND(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
         FROM vec a CROSS JOIN vec b WHERE a.id <> b.id),
 rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                  ORDER BY cosine DESC, dst) AS rnk FROM s2c),
 e AS MATERIALIZED (SELECT src, dst FROM rk WHERE rnk <= 10),
 i2 AS (SELECT a.src AS u, b.src AS w2, COUNT(*) AS c
        FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        GROUP BY 1, 2),
 sn AS (SELECT u, w2, CAST(c * ({_LPA_SCALE} // (20 - c)) AS DOUBLE) AS w
        FROM i2 WHERE c / (20.0 - c) >= 1.0 / 15.0),
 und AS MATERIALIZED (SELECT u AS src, w2 AS dst, w FROM sn
         UNION ALL SELECT w2, u, w FROM sn),
 l0 AS MATERIALIZED (
   SELECT src AS id, src AS label FROM (SELECT DISTINCT src FROM und))"""
    for k in range(lpa_iters):
        sql += f""",
 v{k} AS (SELECT e.src, l.label AS nl, SUM(e.w) AS w
          FROM und e JOIN l{k} l ON e.dst = l.id GROUP BY 1, 2),
 b{k} AS (SELECT src, MIN(nl) AS new FROM (
            SELECT src, nl, w, MAX(w) OVER (PARTITION BY src) AS mw
            FROM v{k}) t
          WHERE w >= mw GROUP BY src),
 l{k + 1} AS MATERIALIZED (
   SELECT l.id, COALESCE(b.new, l.label) AS label
   FROM l{k} l LEFT JOIN b{k} b ON l.id = b.src)"""
    return sql + f"""
SELECT k.sample, k.barcode, l.label AS cluster,
       CAST(k.ncount AS DOUBLE) AS ncount, k.nfeature
FROM kept k LEFT JOIN l{lpa_iters} l
  ON (k.sample || '_' || CAST(k.barcode AS VARCHAR)) = l.id"""


@_q("p1_qc_pipeline", _p1_oracle_sql())
def q_qc_pipeline(spark, sf):
    """End-to-end stage 1→4 chain under a FULL value oracle: size +
    mito filters → doublet gate (grid scorer runs; threshold 1.0 so
    the gate is output-invariant and the oracle need not replay the
    simulation) → LogNormalize → vst-quad HVG → ScaleData →
    reduction='none' (cluster on the scaled HVG space — PCA is
    deterministic only up to eigen-sign, so the SQL-replayable
    composite pins the no-eigen path; m8/x99 pin the eigen stage on
    their own) → exact kNN → SNN → fixed-point LPA — all through
    run_qc's Experiment/subset_cells orchestration on a 1-in-20
    barcode subsample. The Huber-IRLS band step is excluded (its
    iterative reweighting is not SQL-replayable; m4/f11 pin that
    operator separately)."""
    from data_ingest_spark.pipeline import Experiment, assemble_cells, run_qc
    expr = expr_df(spark, sf).filter(F.col("barcode") % 20 == 0)
    genes = expr.select("gene").distinct().withColumn(
        "name",
        F.when(F.col("gene") % 50 == 0,
               F.concat(F.lit("MT-"), F.col("gene")))
        .otherwise(F.concat(F.lit("G"), F.col("gene"))))
    cells = assemble_cells(expr, genes=genes)
    exp = Experiment(expression=expr, cells=cells, genes=genes)
    final, _ = run_qc(exp, {
        "cellSizeDistribution": {"minCellSize": 30.0},
        "mitochondrialContent": {"maxFraction": 0.2},
        "doubletScores": {"probabilityThreshold": 1.0},
        "dataIntegration": {"nfeatures": 64,
                            "selection_method": "vst_quad",
                            "reduction": "none", "integrate": False},
        "configureEmbedding": {"k": 10, "computeEmbedding": False,
                               "lpaIter": 5},
    }, order=["cellSizeDistribution", "mitochondrialContent", "classifier",
              "doubletScores", "dataIntegration", "configureEmbedding"])
    return final.cells.select(
        "sample", "barcode", "cluster",
        F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("nFeature_RNA").cast("long").alias("nfeature"))


@_q("x34_decontam", f"""
WITH src AS (SELECT doc_id, text FROM documents),{_shingle_ctes('src')},
 bsh AS (SELECT DISTINCT shingle FROM shx WHERE doc_id % 97 = 0),
 csh AS (SELECT doc_id, shingle FROM shx WHERE doc_id % 97 <> 0),
 sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM csh GROUP BY 1),
 hits AS (SELECT c.doc_id, COUNT(*) AS n_hit
          FROM csh c JOIN bsh b ON c.shingle = b.shingle GROUP BY 1)
SELECT h.doc_id, CAST(h.n_hit AS BIGINT) AS n_hit_shingles,
       CAST(s.n_shingles AS BIGINT) AS n_shingles, TRUE AS contaminated
FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
""")
def q_decontam(spark, sf):
    """Benchmark decontamination: docs sharing any 3-gram with the
    held-out 'benchmark' slice (doc_id % 97 = 0). Benchmark shingles
    broadcast; only the hit counts shuffle."""
    docs = load(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return dd.decontaminate(corpus, bench, k=3)


def _pii_oracle_sql() -> str:
    from data_ingest_spark.extensions.text import PII_PATTERNS
    e, i, p = (PII_PATTERNS["email"], PII_PATTERNS["ipv4"],
               PII_PATTERNS["phone"])
    aug = ("text || ' contact doc' || CAST(doc_id AS VARCHAR)"
           " || '@example.com from 10.0.'"
           " || CAST(doc_id % 256 AS VARCHAR) || '.7 call +1 555 000 '"
           " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS t FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
    t, '{e}', '[EMAIL]', 'g'), '{i}', '[IPV4]', 'g'),
    '{p}', '[PHONE]', 'g') AS clean_text,
  CAST(len(regexp_extract_all(t, '{e}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '{i}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(t, '{p}')) AS BIGINT) AS n_phone
FROM aug
"""


@_q("x35_pii_redact", _pii_oracle_sql())
def q_pii_redact(spark, sf):
    """PII scrubbing over a deterministically augmented corpus (each
    doc gets a synthetic email/IP/phone derived from doc_id, so the
    oracle checks real redactions, not all-zero counts)."""
    from data_ingest_spark.extensions.text import pii_redact
    docs = load(spark, sf, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact doc"),
            F.col("doc_id").cast("string"), F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call +1 555 000 "),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"))
    out = pii_redact(aug)
    return out.select("doc_id", "clean_text",
                      F.col("n_email").cast("long").alias("n_email"),
                      F.col("n_ipv4").cast("long").alias("n_ipv4"),
                      F.col("n_phone").cast("long").alias("n_phone"))


@_q("x36_bpe_pairs", """
WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
           FROM documents),
 wf AS (SELECT w, COUNT(*) AS f FROM t WHERE length(w) >= 2 GROUP BY 1),
 p AS (SELECT unnest([substr(w, i, 2) FOR i IN
                      generate_series(1, length(w) - 1)]) AS pair, f
       FROM wf),
 c AS (SELECT pair, CAST(SUM(f) AS BIGINT) AS pair_count FROM p GROUP BY 1)
SELECT pair, pair_count FROM c ORDER BY pair_count DESC, pair LIMIT 50
""")
def q_bpe_pairs(spark, sf):
    """First BPE merge iteration: adjacent-char pair counts over the
    vocabulary, weighted by word frequency; integer-exact top-50."""
    from data_ingest_spark.extensions.text import bpe_pair_counts
    return bpe_pair_counts(load(spark, sf, "documents"), top_k=50)


@_q("x37_token_drift", """
WITH tok AS (SELECT source AS grp,
                    unnest(string_split_regex(lower(text), '\\s+')) AS token
             FROM documents),
 gt AS (SELECT grp, token, COUNT(*) AS n_gt FROM tok GROUP BY 1, 2),
 tm AS (SELECT token, SUM(n_gt) AS n_t FROM gt GROUP BY 1),
 gtot AS (SELECT grp, SUM(n_gt) AS g_tokens FROM gt GROUP BY 1),
 tot AS (SELECT SUM(n_gt) AS all_tokens FROM gt),
 sc AS (SELECT g.grp, g.token,
               g.n_gt * t.all_tokens - m.n_t * go.g_tokens AS drift_score
        FROM gt g JOIN tm m USING (token) JOIN gtot go USING (grp)
             CROSS JOIN tot t),
 rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
                  ORDER BY drift_score DESC, token) AS rk FROM sc)
SELECT grp AS source, token, CAST(drift_score AS BIGINT) AS drift_score,
       CAST(rk AS BIGINT) AS rk
FROM rk WHERE rk <= 5
""")
def q_token_drift(spark, sf):
    """Per-source distribution drift: top-5 over-represented tokens by
    the exact-integer cross-product score (no float KL, bit-exact)."""
    from data_ingest_spark.extensions.profile import token_drift
    return token_drift(load(spark, sf, "documents"), group_col="source",
                       top_k=5)


def _curate_oracle_sql() -> str:
    from data_ingest_spark.extensions.sampling import hash_bucket_sql
    from data_ingest_spark.extensions.text import PII_PATTERNS
    e, i, p = (PII_PATTERNS["email"], PII_PATTERNS["ipv4"],
               PII_PATTERNS["phone"])
    b = hash_bucket_sql("doc_id", 42)
    sh = ("CASE WHEN len(tk) >= 3 THEN [tk[i] || ' ' || tk[i+1] || ' ' || "
          "tk[i+2] FOR i IN generate_series(1, len(tk) - 2)] "
          "ELSE [array_to_string(tk, ' ')] END")
    return f"""
WITH red AS (SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(
          text, '{e}', '[EMAIL]', 'g'), '{i}', '[IPV4]', 'g'),
          '{p}', '[PHONE]', 'g') AS t
      FROM documents WHERE doc_id % 97 <> 0),
 qual AS (SELECT doc_id, t,
                 len(string_split_regex(lower(t), '\\s+')) AS n_tokens
          FROM red
          WHERE len(string_split_regex(lower(t), '\\s+')) >= 30),
 first AS (SELECT doc_id, t, n_tokens, ROW_NUMBER() OVER (
             PARTITION BY md5(t) ORDER BY doc_id) AS rk FROM qual),
 kept AS (SELECT doc_id, t, n_tokens FROM first WHERE rk = 1),
 ctoks AS (SELECT doc_id, string_split_regex(lower(t), '\\s+') AS tk
           FROM kept),
 csh AS (SELECT DISTINCT doc_id, unnest({sh}) AS shingle FROM ctoks),
 btoks AS (SELECT string_split_regex(lower(text), '\\s+') AS tk
           FROM documents WHERE doc_id % 97 = 0),
 bsh AS (SELECT DISTINCT unnest({sh}) AS shingle FROM btoks),
 dirty AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh b USING (shingle)),
 clean AS (SELECT k.doc_id, k.n_tokens FROM kept k
           LEFT JOIN dirty d ON k.doc_id = d.doc_id
           WHERE d.doc_id IS NULL)
SELECT doc_id,
       CASE WHEN {b} < 9000 THEN 'train'
            WHEN {b} < 9500 THEN 'valid'
            ELSE 'test' END AS split,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM clean
"""


@_q("p3_curate", _curate_oracle_sql())
def q_curate(spark, sf):
    """End-to-end corpus curation under a full value oracle: PII scrub
    → min-token quality gate → exact dedup keep-first → benchmark
    decontamination (held-out doc_id % 97 = 0 slice) → deterministic
    content-addressed train/valid/test split."""
    from data_ingest_spark.extensions.curate import curate_corpus
    docs = load(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return curate_corpus(corpus, bench, min_tokens=30)


@_q("x38_tokenize_ids", """
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS token,
                     unnest(generate_series(1,
                       len(string_split_regex(lower(text), '\\s+')))) AS pos
              FROM documents),
 counts AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1
            ORDER BY c DESC, token LIMIT 1000),
 vocab AS (SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token) - 1 AS tid
           FROM counts)
SELECT t.doc_id,
       string_agg(CAST(COALESCE(v.tid, -1) AS VARCHAR), ','
                  ORDER BY t.pos) AS ids_csv,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM toks t LEFT JOIN vocab v ON v.token = t.token
GROUP BY t.doc_id
""")
def q_tokenize_ids(spark, sf):
    """Vocab tokenization: frequency-ranked 1000-word vocabulary, docs
    mapped to id sequences (OOV = -1), sequence order preserved."""
    from data_ingest_spark.extensions.text import tokenize_with_vocab
    return tokenize_with_vocab(load(spark, sf, "documents"),
                               vocab_size=1000)


@_q("e13_scd2", """
WITH o AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id,
             CASE WHEN lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
           FROM events),
 isl AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island
         FROM o),
 runs AS (SELECT user_id, island, MIN(event_type) AS event_type,
                 MIN(ts) AS valid_from,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM isl GROUP BY 1, 2)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events
FROM runs
""")
def q_scd2(spark, sf):
    """SCD2 validity intervals over each user's event_type stream
    (gaps-and-islands; consecutive equal values merge)."""
    from data_ingest_spark.extensions.cdc import scd2_history
    return scd2_history(events_df(spark, sf))


@_q("x39_unigram_logprob", """
WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM documents),
 model AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY 1),
 scal AS (SELECT SUM(c) AS tot, COUNT(*) AS v FROM model),
 logp AS (SELECT token,
                 CAST(ROUND(ln((c + 1.0) / (tot + v)) * 1000000) AS BIGINT)
                   AS logp_i
          FROM model CROSS JOIN scal)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(SUM(l.logp_i) / COUNT(*) / 1000000, 6) AS avg_logprob
FROM toks t JOIN logp l ON l.token = t.token
GROUP BY t.doc_id
""")
def q_unigram_logprob(spark, sf):
    """Unigram-LM quality score: mean fixed-point token log-prob under
    the corpus's own add-1 model (integer-exact reduction)."""
    from data_ingest_spark.extensions.text import unigram_logprob
    return unigram_logprob(load(spark, sf, "documents"))


@_q("x40_boilerplate", f"""
WITH src AS (SELECT doc_id, text FROM documents),{_shingle_ctes('src')},
 dfreq AS (SELECT shingle, COUNT(*) AS dfc FROM shx GROUP BY 1),
 marked AS (SELECT s.doc_id, CASE WHEN d.dfc >= 5 THEN 1 ELSE 0 END AS cm
            FROM shx s JOIN dfreq d ON d.shingle = s.shingle)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(cm) AS BIGINT) AS n_common,
       ROUND(SUM(cm) / COUNT(*), 6) AS common_ratio
FROM marked GROUP BY doc_id
""")
def q_boilerplate(spark, sf):
    """Boilerplate detection: fraction of a doc's distinct 3-shingles
    appearing in >= 5 documents corpus-wide."""
    from data_ingest_spark.extensions.text import boilerplate_score
    return boilerplate_score(load(spark, sf, "documents"), k=3, min_df=5)


@_q("v5_tpch_q6", """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""")
def q_tpch_q6(spark, sf):
    """TPC-H Q6 shape (forecast revenue): fully-pushed-down selective
    scan → single scalar aggregate. All four predicates reach the
    parquet reader as PushedFilters; zero shuffles beyond the final
    1-row partial-merge."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
        .alias("revenue"),
        F.count("*").alias("n_items"))


@_q("v6_tpch_q18", """
WITH big AS (SELECT l_orderkey FROM lineitem
             GROUP BY 1 HAVING SUM(l_quantity) > 200)
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
     JOIN lineitem l ON l.l_orderkey = o.o_orderkey
     JOIN big b ON b.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""")
def q_tpch_q18(spark, sf):
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered
    aggregate drives a semi-join-style reduction of lineitem before
    the customer/orders joins; top-100 via TakeOrderedAndProject."""
    li = load(spark, sf, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("_sq"))
           .filter(F.col("_sq") > 200).select("l_orderkey"))
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer").select("c_custkey")
    j = (li.join(F.broadcast(big), "l_orderkey")
         .join(orders, li["l_orderkey"] == orders["o_orderkey"])
         .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]))
    return (j.groupBy("c_custkey", "o_orderkey", "o_orderdate",
                      F.round("o_totalprice", 2).alias("o_totalprice"))
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .orderBy(F.desc("o_totalprice"), "o_orderkey").limit(100))


@_q("v10_tpch_q4", """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
""")
def q_tpch_q4(spark, sf):
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS as
    an inner join + distinct with the SMALL side as the build — date
    predicates push to the orders scan, cutting it to one year, and
    that filtered frame (not the full lineitem) is what the join
    builds/broadcasts. (The naive left-semi with orders probing made
    Catalyst build a hashed relation over ALL of lineitem — the big
    side — every run: measured 2x slower at sf0.1 and the wrong build
    side at any scale.) The distinct on (orderkey, priority) is the
    EXISTS collapse; its shuffle carries only qualifying orderkeys,
    map-side-combined first."""
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    hits = (li.join(o, (o["o_orderkey"] == li["l_orderkey"])
                    & (li["l_shipdate"] > o["o_orderdate"]))
            .select("o_orderkey", "o_orderpriority").distinct())
    return hits.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("order_count"))


@_q("v11_tpch_q13", """
WITH c_orders AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders GROUP BY 1
""")
def q_tpch_q13(spark, sf):
    """TPC-H Q13 shape (customer order distribution): left outer join
    preserving order-less customers, count of non-null keys per
    customer, then a second aggregate over the counts — the two-level
    shuffle pattern AQE coalesces at scale."""
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q("v12_tpch_q14", """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END), 2) AS promo_revenue,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-07-01'
""")
def q_tpch_q14(spark, sf):
    """TPC-H Q14 shape (promotion effect): date-pruned lineitem scan,
    broadcast join to part, conditional aggregate in one pass. The
    promo share is reported as two separately-rounded sums so the
    oracle comparison stays exact-at-6dp instead of a ratio of floats."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp")))
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(p),
                    li["l_partkey"] == p["p_partkey"])
            .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO",
                                              rev).otherwise(0.0)), 2)
                 .alias("promo_revenue"),
                 F.round(F.sum(rev), 2).alias("total_revenue")))


@_q("v13_tpch_q16", """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 2, 3, 4, 5)
GROUP BY 1, 2, 3
""")
def q_tpch_q16(spark, sf):
    """TPC-H Q16 shape (parts/supplier relationship): exclusion
    predicates on the dimension, distinct-count of suppliers per
    (brand, type, size) via lineitem as the part-supplier bridge."""
    p = (load(spark, sf, "part")
         .filter((F.col("p_brand") != "Brand#1")
                 & F.col("p_size").isin(1, 2, 3, 4, 5))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@_q("v14_tpch_q22", """
WITH avg_bal AS (SELECT AVG(c_acctbal) AS a FROM customer
                 WHERE c_acctbal > 0.0),
 recent AS (SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01')
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey,
     avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM recent r
                  WHERE r.o_custkey = c.c_custkey)
GROUP BY 1
""")
def q_tpch_q22(spark, sf):
    """TPC-H Q22 shape (global sales opportunity): scalar-subquery
    threshold kept lazy as a broadcast 1-row cross join, anti-join
    against recently-active customers, broadcast nation lookup."""
    c = load(spark, sf, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("_a")))
    recent = (load(spark, sf, "orders")
              .filter(F.col("o_orderdate")
                      >= F.lit("2000-01-01").cast("timestamp"))
              .select("o_custkey").distinct())
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    sel = (c.crossJoin(F.broadcast(avg_bal))
           .filter(F.col("c_acctbal") > F.col("_a"))
           .join(recent, c["c_custkey"] == recent["o_custkey"],
                 "left_anti")
           .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]))
    return sel.groupBy("n_name").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))


