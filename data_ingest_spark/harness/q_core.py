"""Core QC families: A aggregations, F filters, J joins, W windows, U set ops, M science (emptyDrops, OLS band, normalize/HVG/scale).

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

# ---------------------------------------------------------------- A: aggregations


@_q("a1_a2_cell_counts", """
SELECT l_returnflag AS sample, l_orderkey AS barcode,
       CAST(SUM(l_quantity) AS DOUBLE) AS ncount,
       CAST(COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS BIGINT) AS nfeature
FROM lineitem GROUP BY 1, 2
""")
def q_cell_counts(spark, sf):
    return mx.cell_counts(expr_df(spark, sf)).select(
        "sample", "barcode",
        F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("nFeature_RNA").cast("long").alias("nfeature"),
    )


@_q("a3_gene_stats", """
SELECT l_partkey AS gene,
       CAST(SUM(l_quantity) AS DOUBLE) AS total_umi,
       CAST(COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS BIGINT) AS n_cells
FROM lineitem GROUP BY 1
""")
def q_gene_stats(spark, sf):
    return mx.gene_stats(expr_df(spark, sf)).select(
        "gene", F.col("total_umi").cast("double").alias("total_umi"),
        F.col("n_cells").cast("long").alias("n_cells"))


@_q("v1_sql_surface", """
SELECT l_returnflag AS sample,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_cells,
       CAST(SUM(l_quantity) AS DOUBLE) AS total_umi,
       ROUND(SUM(l_quantity) / COUNT(DISTINCT l_orderkey), 6)
         AS mean_cell_size
FROM lineitem GROUP BY 1
""")
def q_sql_surface(spark, sf):
    """The spark.sql front door: the same engine tables are reachable
    as temp views and queried with SQL text — the exact plan the
    DataFrame API builds (Catalyst does not care which surface fed it).
    One query keeps the surface itself under the correctness gate."""
    expr_df(spark, sf).createOrReplaceTempView("expression")
    return spark.sql("""
        SELECT sample,
               CAST(COUNT(DISTINCT barcode) AS BIGINT) AS n_cells,
               CAST(SUM(count) AS DOUBLE) AS total_umi,
               ROUND(SUM(count) / COUNT(DISTINCT barcode), 6)
                 AS mean_cell_size
        FROM expression GROUP BY sample""")


@_q("a4_percent_mt", """
SELECT l_returnflag AS sample, l_orderkey AS barcode,
       ROUND(100.0 * SUM(CASE WHEN l_partkey % 13 = 0 THEN l_quantity ELSE 0.0 END)
             / SUM(l_quantity), 6) AS pmt
FROM lineitem GROUP BY 1, 2
""")
def q_percent_mt(spark, sf):
    expr = expr_df(spark, sf)
    mt = expr.select("gene").distinct().filter(F.col("gene") % 13 == 0)
    return mx.percent_mt(expr, mt).select(
        "sample", "barcode", F.round("percent_mt", 6).alias("pmt"))


@_q("a5_ambient_census", """
WITH t AS (SELECT l_returnflag AS s, l_orderkey AS b, SUM(l_quantity) AS total
           FROM lineitem GROUP BY 1, 2)
SELECT s AS sample,
       CAST(COUNT(CASE WHEN total < 100 THEN 1 END) AS BIGINT) AS n_ambient,
       CAST(MIN(total) AS DOUBLE) AS min_total,
       CAST(MAX(total) AS DOUBLE) AS max_total
FROM t GROUP BY 1
""")
def q_ambient_census(spark, sf):
    return mx.ambient_census(expr_df(spark, sf), lower=100.0).select(
        "sample", F.col("n_ambient").cast("long").alias("n_ambient"),
        F.col("min_total").cast("double").alias("min_total"),
        F.col("max_total").cast("double").alias("max_total"))


@_q("a6_median_gene_sum", """
WITH g AS (SELECT l_partkey, SUM(l_quantity) AS total FROM lineitem GROUP BY 1)
SELECT ROUND(MEDIAN(total), 6) AS median_gene_umi FROM g
""")
def q_median_gene_sum(spark, sf):
    return mx.median_gene_sum(expr_df(spark, sf)).select(
        F.round("median_gene_umi", 6).alias("median_gene_umi"))


@_q("a7_singlet_max", """
SELECT o_orderpriority AS sample, ROUND(MAX(o_totalprice), 2) AS max_singlet_score
FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
""")
def q_singlet_max(spark, sf):
    cells = load(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("sample"),
        F.col("o_totalprice").alias("doublet_scores"),
        F.when(F.col("o_orderstatus") == "F", "singlet")
        .otherwise("doublet").alias("doublet_class"),
    )
    return mx.singlet_max(cells).select(
        "sample", F.round("max_singlet_score", 2).alias("max_singlet_score"))


@_q("a8_distinct_values",
    "SELECT DISTINCT l_returnflag AS sample, l_linestatus AS status FROM lineitem")
def q_distinct_values(spark, sf):
    li = load(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("sample"),
        F.col("l_linestatus").alias("status"))
    return mx.distinct_values(li, ["sample", "status"])


@_q("a10_histogram", """
SELECT CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) * 10000.0 AS bin_start
FROM orders GROUP BY 1
""")
def q_histogram(spark, sf):
    return mx.histogram(load(spark, sf, "orders"), "o_totalprice", 10000.0) \
        .select("bin", F.col("n").cast("long").alias("n"), "bin_start")


@_q("a12_checksum", """
SELECT source, md5(string_agg(text, chr(1) ORDER BY text)) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY source
""")
def q_checksum(spark, sf):
    return load(spark, sf, "documents").groupBy("source").agg(
        F.md5(F.concat_ws("\x01", F.sort_array(F.collect_list("text")))
              .cast("binary")).alias("checksum"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------- F: filters


@_q("f1_min_cell_size", """
SELECT l_returnflag AS sample, l_orderkey AS barcode,
       CAST(SUM(l_quantity) AS DOUBLE) AS ncount
FROM lineitem GROUP BY 1, 2 HAVING SUM(l_quantity) >= 150
""")
def q_f1(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf)).withColumnRenamed(
        "nCount_RNA", "ncount")
    return fl.filter_min_cell_size(
        cells.withColumnRenamed("ncount", "nCount_RNA"), 150.0).select(
        "sample", "barcode", F.col("nCount_RNA").cast("double").alias("ncount"))


@_q("f2_mt_content", """
SELECT sample, barcode, fmt FROM (
  SELECT l_returnflag AS sample, l_orderkey AS barcode,
         ROUND(SUM(CASE WHEN l_partkey % 13 = 0 THEN l_quantity ELSE 0.0 END)
               / SUM(l_quantity), 6) AS fmt
  FROM lineitem GROUP BY 1, 2
) WHERE fmt <= 0.3
""")
def q_f2(spark, sf):
    expr = expr_df(spark, sf)
    mt = expr.select("gene").distinct().filter(F.col("gene") % 13 == 0)
    cells = mx.percent_mt(expr, mt).withColumn(
        "fraction_mt", F.round("fraction_mt", 6))
    return fl.filter_mt_content(cells, 0.3).select(
        "sample", "barcode", F.col("fraction_mt").alias("fmt"))


@_q("f3_classifier_fdr", """
SELECT o_orderkey AS barcode, fdr FROM (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus <> 'P'
              THEN (o_orderkey % 1000) / 999.0 END AS fdr
  FROM orders
) WHERE fdr <= 0.05
""")
def q_f3(spark, sf):
    cells = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("barcode"),
        F.when(F.col("o_orderstatus") != "P",
               (F.col("o_orderkey") % 1000) / 999.0).alias("fdr"),
    )
    return fl.filter_classifier_fdr(cells, 0.05, "fdr")


@_q("f4_doublet_score", """
SELECT s_suppkey AS barcode, s_acctbal AS doublet_scores
FROM supplier WHERE s_acctbal <= 5000.0
""")
def q_f4(spark, sf):
    cells = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("barcode"),
        F.col("s_acctbal").alias("doublet_scores"))
    return fl.filter_doublet_score(cells, 5000.0)


@_q("f5_min_features", f"""
WITH q AS (SELECT l_returnflag AS s, l_orderkey AS b FROM lineitem
           GROUP BY 1, 2
           HAVING COUNT(CASE WHEN l_quantity > 0 THEN 1 END) >= 3)
SELECT e.sample, e.barcode, e.gene, e.cnt
FROM ({_EXPR_SQL}) e JOIN q ON e.sample = q.s AND e.barcode = q.b
""")
def q_f5(spark, sf):
    return fl.filter_min_features(expr_df(spark, sf), 3) \
        .withColumnRenamed("count", "cnt")


@_q("f6_prune", f"""
WITH gg AS (SELECT l_partkey AS g FROM lineitem GROUP BY 1
            HAVING COUNT(CASE WHEN l_quantity > 0 THEN 1 END) >= 5),
     pruned AS (SELECT e.* FROM ({_EXPR_SQL}) e JOIN gg ON e.gene = gg.g),
     q AS (SELECT sample AS s, barcode AS b FROM pruned GROUP BY 1, 2
           HAVING COUNT(CASE WHEN cnt > 0 THEN 1 END) >= 3)
SELECT p.sample, p.barcode, p.gene, p.cnt
FROM pruned p JOIN q ON p.sample = q.s AND p.barcode = q.b
""")
def q_f6(spark, sf):
    return fl.prune_genes_and_cells(expr_df(spark, sf), 5, 3) \
        .withColumnRenamed("count", "cnt")


@_q("f7_subset_samples", """
SELECT l_returnflag AS sample, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem WHERE l_returnflag IN ('A', 'N') GROUP BY 1
""")
def q_f7(spark, sf):
    return fl.subset_samples(expr_df(spark, sf), ["A", "N"]) \
        .groupBy("sample").agg(F.count("*").alias("n"))


@_q("f8_projection", "SELECT p_partkey, p_name FROM part")
def q_f8(spark, sf):
    return fl.project(load(spark, sf, "part"), ["p_partkey", "p_name"])


@_q("f9_mt_regex", """
SELECT p_partkey AS gene, p_name AS name FROM part
WHERE regexp_matches(p_name, '(?i)^(red|blue)')
""")
def q_f9(spark, sf):
    genes = load(spark, sf, "part").select(
        F.col("p_partkey").alias("gene"), F.col("p_name").alias("name"))
    return fl.mt_gene_predicate(genes, "^(red|blue)")


@_q("f11_remove_outliers", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2)
SELECT sample, barcode, CAST(ncount AS DOUBLE) AS ncount
FROM c WHERE ncount <= 400
""")
def q_f11(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    outliers = cells.filter(F.col("nCount_RNA") > 400)
    return fl.remove_outliers(cells, outliers).select(
        "sample", "barcode", F.col("nCount_RNA").cast("double").alias("ncount"))


# ---------------------------------------------------------------- J: joins


@_q("j1_emptydrops", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2),
     e AS (SELECT sample, barcode,
                  ROUND((barcode % 997) / 996.0, 6) AS fdr
           FROM c WHERE ncount > 200)
SELECT c.sample, c.barcode, CAST(c.ncount AS DOUBLE) AS ncount,
       e.fdr AS ed_fdr
FROM c LEFT JOIN e ON c.sample = e.sample AND c.barcode = e.barcode
""")
def q_j1(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    edt = cells.filter(F.col("nCount_RNA") > 200).select(
        "sample", "barcode",
        F.round((F.col("barcode") % 997) / 996.0, 6).alias("fdr"))
    return jn.join_emptydrops(cells, edt).select(
        "sample", "barcode", F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("emptyDrops_fdr").alias("ed_fdr"))


@_q("j2_doublet_scores", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2)
SELECT c.sample, c.barcode, CAST(c.ncount AS DOUBLE) AS ncount,
       ROUND(o.o_totalprice, 2) AS ds, o.o_orderstatus AS dclass
FROM c LEFT JOIN orders o ON c.barcode = o.o_orderkey
""")
def q_j2(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    scores = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("barcode"),
        F.round("o_totalprice", 2).alias("ds"),
        F.col("o_orderstatus").alias("dclass"))
    return jn.join_doublet_scores(cells, scores, keys=["barcode"]).select(
        "sample", "barcode", F.col("nCount_RNA").cast("double").alias("ncount"),
        "ds", "dclass")


@_q("j3_align_annotations", """
SELECT p_partkey AS gene, p_name, p_brand FROM part
JOIN (SELECT DISTINCT l_partkey FROM lineitem) d ON p_partkey = l_partkey
""")
def q_j3(spark, sf):
    genes = load(spark, sf, "part").select(
        F.col("p_partkey").alias("gene"), "p_name", "p_brand")
    return jn.align_annotations(genes, expr_df(spark, sf))


@_q("j4_sample_metadata", """
SELECT c_custkey, ROUND(c_acctbal, 2) AS acctbal, n.n_name
FROM customer LEFT JOIN nation n ON c_nationkey = n_nationkey
""")
def q_j4(spark, sf):
    cells = load(spark, sf, "customer").select(
        "c_custkey", F.round("c_acctbal", 2).alias("acctbal"),
        F.col("c_nationkey").alias("nk"))
    meta = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name")
    return jn.join_sample_metadata(cells, meta, key="nk") \
        .select("c_custkey", "acctbal", "n_name")


@_q("j5_semi_features", """
SELECT s_suppkey AS gene, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
""")
def q_j5(spark, sf):
    genes = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("gene"), "s_name")
    ex = load(spark, sf, "lineitem").select(F.col("l_suppkey").alias("gene"))
    return jn.semi_join_features(genes, ex)


@_q("j6_flag", """
SELECT n_nationkey, n_name, r.r_name
FROM nation LEFT JOIN region r ON n_regionkey = r_regionkey
""")
def q_j6(spark, sf):
    samples = load(spark, sf, "nation").select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("rk"))
    flags = load(spark, sf, "region").select(
        F.col("r_regionkey").alias("rk"), "r_name")
    return jn.join_flag(samples, flags, key="rk") \
        .select("n_nationkey", "n_name", "r_name")


@_q("j7_cell_sets", """
SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n_cells,
       md5(string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)) AS ids_md5
FROM customer GROUP BY 1
""")
def q_j7(spark, sf):
    cells = load(spark, sf, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_custkey").alias("cells_id"))
    sets = jn.group_membership(cells, "seg")
    return sets.select(
        "seg", F.col("n_cells").cast("long").alias("n_cells"),
        F.md5(F.concat_ws(",", F.transform(
            F.col("cell_ids"), lambda x: x.cast("string"))).cast("binary")
        ).alias("ids_md5"))


# ---------------------------------------------------------------- W: windows


@_q("w1_barcode_rank", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2)
SELECT sample, barcode, CAST(ncount AS DOUBLE) AS ncount,
       CAST(ROW_NUMBER() OVER (PARTITION BY sample
                               ORDER BY ncount DESC, barcode) AS BIGINT) AS rank
FROM c
""")
def q_w1(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    return wd.barcode_rank(cells).select(
        "sample", "barcode", F.col("nCount_RNA").cast("double").alias("ncount"),
        F.col("rank").cast("long").alias("rank"))


@_q("w2_barcode_inflection", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2),
     f AS (SELECT * FROM c WHERE ncount > 100),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY sample
                                        ORDER BY ncount DESC, barcode) AS rk
           FROM f),
     d AS (SELECT sample, ncount,
                  ROUND((log10(ncount) - log10(LAG(ncount) OVER w))
                        / (log10(rk) - log10(LAG(rk) OVER w)), 9) AS deriv
           FROM r WINDOW w AS (PARTITION BY sample ORDER BY rk)),
     dd AS (SELECT *, MIN(deriv) OVER (PARTITION BY sample) AS mind
            FROM d WHERE deriv IS NOT NULL)
SELECT sample, CAST(MIN(ncount) AS DOUBLE) AS inflection_ncount
FROM dd WHERE deriv = mind GROUP BY sample
""")
def q_w2(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    return wd.barcode_inflection(cells, 100.0).select(
        "sample", F.col("inflection_ncount").cast("double")
        .alias("inflection_ncount"))


@_q("w3_sort_regression", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount
           FROM lineitem GROUP BY 1, 2)
SELECT sample, barcode, ROUND(log10(ncount), 6) AS log_molecules
FROM c ORDER BY log10(ncount), barcode LIMIT 100
""")
def q_w3(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    return wd.sort_for_regression(cells).limit(100).select(
        "sample", "barcode", F.round("log_molecules", 6).alias("log_molecules"))


@_q("w4_top_k_genes", """
SELECT l_partkey AS gene, CAST(SUM(l_quantity) AS DOUBLE) AS total_umi
FROM lineitem GROUP BY 1 ORDER BY SUM(l_quantity) DESC, l_partkey LIMIT 30
""")
def q_w4(spark, sf):
    gs = mx.gene_stats(expr_df(spark, sf))
    return wd.top_k_genes(gs, 30).select(
        "gene", F.col("total_umi").cast("double").alias("total_umi"))


@_q("w5_dense_ids", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode
           FROM lineitem GROUP BY 1, 2)
SELECT sample, barcode,
       CAST(ROW_NUMBER() OVER (ORDER BY sample, barcode) - 1 AS INTEGER) AS cells_id
FROM c
""")
def q_w5(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf)).select("sample", "barcode")
    return wd.dense_ids_scalable(cells).select("sample", "barcode", "cells_id")


@_q("w6_dedup_gene_names", """
SELECT p_partkey AS gene,
       CASE WHEN COUNT(*) OVER (PARTITION BY p_name) > 1
            THEN p_name || ' - ' || CAST(p_partkey AS VARCHAR)
            ELSE p_name END AS name
FROM part
""")
def q_w6(spark, sf):
    genes = load(spark, sf, "part").select(
        F.col("p_partkey").alias("gene"), F.col("p_name").alias("name"))
    return wd.dedup_gene_names(genes)


# ---------------------------------------------------------------- U: set ops


@_q("u1_merge_samples", """
SELECT l_returnflag AS sample,
       l_returnflag || '_' || CAST(l_orderkey AS VARCHAR) AS barcode,
       l_partkey AS gene, l_quantity AS cnt
FROM lineitem
""")
def q_u1(spark, sf):
    expr = expr_df(spark, sf).withColumn("barcode", F.col("barcode").cast("string"))
    per_sample = [expr.filter(F.col("sample") == s) for s in ("A", "N", "R")]
    return mg.merge_samples(per_sample).withColumnRenamed("count", "cnt")


@_q("u2_union_dedup", """
SELECT DISTINCT p_partkey AS gene, p_brand, p_size FROM part
WHERE p_size <= 25 OR p_size >= 20
""")
def q_u2(spark, sf):
    part = load(spark, sf, "part").select(
        F.col("p_partkey").alias("gene"), "p_brand", "p_size")
    a = part.filter(F.col("p_size") <= 25)
    b = part.filter(F.col("p_size") >= 20)
    return mg.union_dedup([a, b])


# ---------------------------------------------------------------- M: science
from data_ingest_spark.functions.stats import normal_cdf_sql  # noqa: E402


@_q("m1_bh_fdr", """
WITH d AS (SELECT o_orderpriority AS sample, o_orderkey AS barcode,
                  (o_orderkey % 997) / 996.0 AS p
           FROM orders),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY sample ORDER BY p) AS rk,
                  COUNT(*) OVER (PARTITION BY sample) AS n
           FROM d)
SELECT sample, barcode, ROUND(p, 6) AS p,
       ROUND(LEAST(1.0, MIN(p * n / rk) OVER (
             PARTITION BY sample ORDER BY rk
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6) AS fdr
FROM r
""")
def q_bh_fdr(spark, sf):
    d = load(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("sample"),
        F.col("o_orderkey").alias("barcode"),
        ((F.col("o_orderkey") % 997) / 996.0).alias("p"))
    return ed.bh_fdr(d, "p", "fdr").select(
        "sample", "barcode", F.round("p", 6).alias("p"),
        F.round("fdr", 6).alias("fdr"))


_ED_LOWER, _ED_ALPHA, _ED_NITER = 100.0, 0.5, 10000

_ED_SQL = f"""
WITH expr AS ({_EXPR_SQL}),
 totals AS (SELECT sample, barcode, SUM(cnt) AS t FROM expr GROUP BY 1, 2),
 amb AS (SELECT e.sample, e.gene, SUM(e.cnt) AS amb
         FROM expr e JOIN totals t
           ON e.sample = t.sample AND e.barcode = t.barcode
         WHERE t.t <= {_ED_LOWER} GROUP BY 1, 2),
 allg AS (SELECT DISTINCT sample, gene FROM expr),
 sm AS (SELECT a.sample, a.gene,
               COALESCE(amb.amb, 0.0) + {_ED_ALPHA} AS w
        FROM allg a LEFT JOIN amb ON a.sample = amb.sample AND a.gene = amb.gene),
 mom AS (SELECT sample, ln(SUM(w)) AS lnW,
                SUM(w * ln(w)) / SUM(w) - ln(SUM(w)) AS m1,
                (SUM(w * ln(w) * ln(w)) - 2 * ln(SUM(w)) * SUM(w * ln(w))
                 + ln(SUM(w)) * ln(SUM(w)) * SUM(w)) / SUM(w) AS m2
         FROM sm GROUP BY 1),
 ll AS (SELECT e.sample, e.barcode, SUM(e.cnt) AS total,
               SUM(e.cnt * ln(s.w)) AS slnw
        FROM expr e JOIN sm s ON e.sample = s.sample AND e.gene = s.gene
        GROUP BY 1, 2),
 zt AS (SELECT ll.sample, ll.barcode, ll.total,
               ll.slnw - ll.total * m.lnW AS logprob,
               ((ll.slnw - ll.total * m.lnW) - ll.total * m.m1)
                 / sqrt(ll.total * (m.m2 - m.m1 * m.m1)) AS z
        FROM ll JOIN mom m ON ll.sample = m.sample),
 pv AS (SELECT sample, barcode, total, logprob,
               CASE WHEN total > {_ED_LOWER}
                    THEN {normal_cdf_sql('z')} END AS pvalue
        FROM zt),
 rk AS (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY sample
                                  ORDER BY pvalue ASC NULLS LAST) AS rnk,
               COUNT(pvalue) OVER (PARTITION BY sample) AS n
        FROM pv)
SELECT sample, barcode, CAST(total AS DOUBLE) AS total,
       ROUND(logprob, 6) AS logprob, ROUND(pvalue, 6) AS pvalue,
       CASE WHEN pvalue IS NOT NULL
            THEN pvalue < 1.0 / ({_ED_NITER} + 1) END AS limited,
       CASE WHEN pvalue IS NOT NULL THEN
         ROUND(LEAST(1.0, MIN(pvalue * n / rnk) OVER (
               PARTITION BY sample ORDER BY rnk
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)), 6)
       END AS fdr
FROM rk
"""


@_q("m1_empty_drops", _ED_SQL)
def q_empty_drops(spark, sf):
    r = ed.empty_drops(expr_df(spark, sf), lower=_ED_LOWER, n_iter=_ED_NITER)
    return r.select(
        "sample", "barcode", F.col("Total").cast("double").alias("total"),
        F.round("LogProb", 6).alias("logprob"),
        F.round("PValue", 6).alias("pvalue"),
        F.col("Limited").alias("limited"),
        F.round("FDR", 6).alias("fdr"))


@_q("m4_ols_band", """
WITH c AS (SELECT l_returnflag AS sample, l_orderkey AS barcode,
                  SUM(l_quantity) AS ncount,
                  COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS nfeature
           FROM lineitem GROUP BY 1, 2),
 pts AS (SELECT sample, barcode, log10(ncount) AS x, log10(nfeature) AS y FROM c),
 s AS (SELECT sample, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
              SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
       FROM pts GROUP BY 1),
 f1 AS (SELECT sample, n, sx, sy, sxy, syy,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        FROM s),
 fit AS (SELECT sample, slope,
                (sy - slope * sx) / n AS intercept,
                sqrt((syy - slope * sxy - ((sy - slope * sx) / n) * sy)
                     / (n - 2.0)) AS rmse
         FROM f1)
SELECT p.sample, p.barcode,
       ROUND(f.intercept + f.slope * p.x, 6) AS pred,
       (abs(p.y - (f.intercept + f.slope * p.x)) > 3.0 * f.rmse) AS is_outlier
FROM pts p JOIN fit f ON p.sample = f.sample
""")
def q_ols_band(spark, sf):
    cells = mx.cell_counts(expr_df(spark, sf))
    return rg.ols_band(cells, z=3.0).select(
        "sample", "barcode", F.round("pred", 6).alias("pred"), "is_outlier")


@_q("m5_log_normalize", f"""
WITH expr AS ({_EXPR_SQL}),
 totals AS (SELECT sample, barcode, SUM(cnt) AS t FROM expr GROUP BY 1, 2)
SELECT e.sample, e.barcode, e.gene,
       ROUND(ln(1.0 + e.cnt / t.t * 10000.0), 6) AS normalized
FROM expr e JOIN totals t ON e.sample = t.sample AND e.barcode = t.barcode
""")
def q_log_normalize(spark, sf):
    return nz.log_normalize(expr_df(spark, sf)).select(
        "sample", "barcode", "gene", F.round("normalized", 6).alias("normalized"))


_MOMENTS_SQL = f"""
WITH expr AS ({_EXPR_SQL}),
 nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
        FROM (SELECT DISTINCT sample, barcode FROM expr)),
 g AS (SELECT gene, SUM(cnt) AS s, SUM(cnt * cnt) AS ss FROM expr GROUP BY 1)
SELECT gene, ROUND(s / n, 6) AS mean,
       ROUND((ss - s * s / n) / (n - 1.0), 6) AS variance
FROM g, nc
"""


@_q("m6_gene_moments", _MOMENTS_SQL)
def q_gene_moments(spark, sf):
    return nz.gene_moments(expr_df(spark, sf)).select(
        "gene", F.round("mean", 6).alias("mean"),
        F.round("variance", 6).alias("variance"))


@_q("m6_hvg", f"""
WITH expr AS ({_EXPR_SQL}),
 nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
        FROM (SELECT DISTINCT sample, barcode FROM expr)),
 g AS (SELECT gene, SUM(cnt) AS s, SUM(cnt * cnt) AS ss FROM expr GROUP BY 1),
 v AS (SELECT gene, (ss - s * s / n) / (n - 1.0) AS variance FROM g, nc)
SELECT gene, ROUND(variance, 6) AS variance
FROM v ORDER BY variance DESC, gene LIMIT 500
""")
def q_hvg(spark, sf):
    return nz.highly_variable_genes(expr_df(spark, sf), 500).select(
        "gene", F.round("variance", 6).alias("variance"))


# (m6_vst — the loess-smoothed Seurat vst — was retired from the
# registry in round 6 per the round-5 verdict ask: the driver-side
# loess fit is irreducibly non-SQL-expressible, so it could never
# graduate past rows-only, while m6_vst_quad below pins the identical
# standardization pipeline end-to-end with a full value oracle. The
# loess operator itself (operators/normalize.py
# find_variable_features_vst) remains in the package, exercised by
# tests/test_normalize_joins.py against an independent numpy
# recomputation.)


@_q("m6_vst_quad", f"""
WITH expr AS ({_EXPR_SQL}),
 nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
        FROM (SELECT DISTINCT sample, barcode FROM expr)),
 g AS (SELECT gene, SUM(cnt) AS s, SUM(cnt * cnt) AS ss FROM expr GROUP BY 1),
 mom AS (SELECT gene, s / n AS mean, (ss - s * s / n) / (n - 1.0) AS variance, n
         FROM g, nc),
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
 fit AS (SELECT pu.gene, pu.mean, pu.variance, pu.n,
                sqrt(power(10.0, (c.n0 / c.det) + (c.n1 / c.det) * pu.u
                                 + (c.n2 / c.det) * pu.u * pu.u)) AS sd_exp
         FROM pu, coef c),
 pg AS (SELECT e.gene,
               SUM(LEAST(sqrt(f.n), (e.cnt - f.mean) / f.sd_exp)
                   * LEAST(sqrt(f.n), (e.cnt - f.mean) / f.sd_exp)) AS s_nz,
               CAST(COUNT(*) AS DOUBLE) AS nnz,
               ANY_VALUE(f.mean) AS mean, ANY_VALUE(f.variance) AS variance,
               ANY_VALUE(f.sd_exp) AS sd_exp, ANY_VALUE(f.n) AS n
        FROM expr e JOIN fit f ON e.gene = f.gene GROUP BY 1)
SELECT gene, ROUND(mean, 6) AS mean, ROUND(variance, 6) AS variance,
       ROUND(sd_exp, 6) AS sd_exp,
       ROUND((s_nz + (n - nnz) * (mean / sd_exp) * (mean / sd_exp))
             / (n - 1.0), 6) AS std_variance
FROM pg
""")
def q_vst_quad(spark, sf):
    """M6 with the oracle-exact quadratic smoother — the hash-checkable
    twin of m6_vst (which keeps Seurat's loess and is rows-only)."""
    return nz.vst_quadfit_variance(expr_df(spark, sf)).select(
        "gene", F.round("mean", 6).alias("mean"),
        F.round("variance", 6).alias("variance"),
        F.round("sd_exp", 6).alias("sd_exp"),
        F.round("std_variance", 6).alias("std_variance"))


@_q("m7_scale_data", f"""
WITH expr AS ({_EXPR_SQL}),
 totals AS (SELECT sample, barcode, SUM(cnt) AS t FROM expr GROUP BY 1, 2),
 norm AS (SELECT e.sample, e.barcode, e.gene,
                 ln(1.0 + e.cnt / t.t * 10000.0) AS v
          FROM expr e JOIN totals t
            ON e.sample = t.sample AND e.barcode = t.barcode),
 nc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
        FROM (SELECT DISTINCT sample, barcode FROM norm)),
 st AS (SELECT gene, SUM(v) AS s, SUM(v * v) AS ss FROM norm GROUP BY 1),
 mo AS (SELECT gene, s / n AS mu,
               sqrt((ss - s * s / n) / (n - 1.0)) AS sd
        FROM st, nc)
SELECT norm.sample, norm.barcode, norm.gene,
       ROUND(CASE WHEN mo.sd <= 0.0 THEN 0.0
                  ELSE LEAST(10.0, (norm.v - mo.mu) / mo.sd) END, 6) AS scaled
FROM norm JOIN mo ON norm.gene = mo.gene
""")
def q_scale_data(spark, sf):
    e = expr_df(spark, sf)
    scaled = nz.scale_data(nz.log_normalize(e), n_cells_src=e)
    return scaled.select("sample", "barcode", "gene",
                         F.round("scaled", 6).alias("scaled"))


