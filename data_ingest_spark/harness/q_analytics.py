"""TPC-H shapes (v-family), SQL-surface scalar/array/window functions, and the mid-band x ops: merges, sketches, PQ/quant, sampling, data-quality gates.

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
from data_ingest_spark.extensions import similarity as sim  # noqa: E402
from data_ingest_spark.extensions import multimodal as mm  # noqa: E402
from data_ingest_spark.extensions import text as tx  # noqa: E402
from data_ingest_spark.harness.registry import events_df  # noqa: E402
from data_ingest_spark.harness.q_extensions import (_ANN_Q, _COS,  # noqa: E402
    _NEARDUP_SQL, _STOP_SQL, _bucket_sql, _dup_corpus, _neardup_corpus,
    _planes_sql, _shingle_ctes)

# --- TPC-H shapes Q7-Q10 (round 3; adapted to the available columns:
# no partsupp table, so Q9's supplycost is a retailprice-derived
# stand-in; the PLAN SHAPES — multi-way dim joins, conditional market
# share, profit expression, returned-items top-k — are the point).


@_q("v24_tpch_q2", """
WITH cost AS (SELECT l_partkey, l_suppkey,
                     (((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        * 10000) // COUNT(*) + 5000) // 10000) / 100.0
                         AS supply_cost
              FROM lineitem GROUP BY 1, 2),
 reg AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
         FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'),
 rc AS (SELECT c.l_partkey, c.l_suppkey, c.supply_cost
        FROM cost c JOIN reg ON reg.s_suppkey = c.l_suppkey),
 mn AS (SELECT l_partkey, MIN(supply_cost) AS min_cost
        FROM rc GROUP BY 1)
SELECT reg.s_acctbal, reg.s_name, reg.n_name, p.p_partkey, p.p_brand,
       rc.supply_cost
FROM rc JOIN mn ON rc.l_partkey = mn.l_partkey
             AND rc.supply_cost = mn.min_cost
 JOIN reg ON reg.s_suppkey = rc.l_suppkey
 JOIN part p ON p.p_partkey = rc.l_partkey
WHERE p.p_size BETWEEN 10 AND 20
ORDER BY reg.s_acctbal DESC, reg.n_name, reg.s_name, p.p_partkey
LIMIT 100
""")
def q_tpch_q2(spark, sf):
    """TPC-H Q2 (min-cost supplier, adapted: supply cost = the
    supplier's average shipped price for the part — integer-cent
    averages are engine-exact; no partsupp in the fixture): correlated
    per-part MIN over region-scoped suppliers + 4-dim join, top-100
    with full tie-break."""
    # exact fixed-point average: integer cents summed exactly, scaled
    # floor-div by count, half-up to cents — float AVG + ROUND straddles
    # half-cent boundaries differently across engines
    cost = (load(spark, sf, "lineitem")
            .groupBy("l_partkey", "l_suppkey")
            .agg((F.expr("((sum(cast(round(l_extendedprice * 100) as long)) "
                         "* 10000) div count(*) + 5000) div 10000") / 100.0)
                 .alias("supply_cost")))
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    reg = (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
           .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
           .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    rc = cost.join(F.broadcast(reg),
                   F.col("l_suppkey") == F.col("s_suppkey"))
    mn = rc.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("supply_cost").alias("min_cost"))
    p = load(spark, sf, "part").filter(
        F.col("p_size").between(10, 20)).select(
        "p_partkey", "p_brand")
    return (rc.join(mn, (F.col("l_partkey") == F.col("_pk"))
                    & (F.col("supply_cost") == F.col("min_cost")))
            .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey",
                    "p_brand", "supply_cost")
            .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
            .limit(100))


@_q("v25_tpch_q11", """
WITH v AS (SELECT l.l_partkey,
                  SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                      AS value_s
           FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
           WHERE n.n_name = 'NATION_5'
           GROUP BY 1),
 t AS (SELECT SUM(value_s) AS total_s FROM v)
SELECT v.l_partkey AS p_partkey,
       ((v.value_s + 50) // 100) / 100.0 AS part_value
FROM v, t WHERE v.value_s * 10000 > t.total_s * 2
""")
def q_tpch_q11(spark, sf):
    """TPC-H Q11 (important stock value, adapted: shipped value per
    part from one nation's suppliers; keep parts holding > 0.02% of
    the national total). The share test runs in exact int64
    fixed-point on BOTH sides, so no float boundary can differ."""
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").filter(F.col("n_name") == "NATION_5") \
        .select("n_nationkey")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    v = (l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .groupBy("l_partkey")
         .agg(F.sum(price_c * (F.lit(100) - disc_c)).alias("value_s")))
    t = v.agg(F.sum("value_s").alias("total_s"))
    return (v.crossJoin(F.broadcast(t))
            .filter(F.col("value_s") * 10000 > F.col("total_s") * 2)
            .select(F.col("l_partkey").alias("p_partkey"),
                    # half-up to cents in EXACT int64 ((v+50) div 100),
                    # then one exact scale-down: a float ROUND here can
                    # straddle the half-cent boundary differently per
                    # engine (Spark rounds the shortest decimal repr,
                    # DuckDB the binary value)
                    (F.expr("(value_s + 50) div 100") / 100.0)
                    .alias("part_value")))


@_q("v26_tpch_q20", """
WITH pq AS (SELECT l_partkey, l_suppkey,
                   CAST(SUM(l_quantity) AS BIGINT) AS sq
            FROM lineitem GROUP BY 1, 2),
 pt AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY 1),
 promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
 cand AS (SELECT DISTINCT pq.l_suppkey
          FROM pq JOIN pt ON pq.l_partkey = pt.l_partkey
           JOIN promo ON promo.p_partkey = pq.l_partkey
          WHERE pq.sq * 10 > pt.tq)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s JOIN cand ON cand.l_suppkey = s.s_suppkey
 JOIN nation n ON n.n_nationkey = s.s_nationkey
""")
def q_tpch_q20(spark, sf):
    """TPC-H Q20 (excess-supply suppliers, adapted: suppliers shipping
    >10% of some PROMO part's total quantity — integer
    quantities keep the share test exact): the nested
    IN-chain / semi-join shape."""
    l = load(spark, sf, "lineitem")
    pq = (l.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").cast("long").alias("sq")))
    pt = pq.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("sq").alias("tq"))
    promo = load(spark, sf, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    cand = (pq.join(pt, F.col("l_partkey") == F.col("_pk"))
            .join(F.broadcast(promo),
                  F.col("l_partkey") == F.col("p_partkey"))
            .filter(F.col("sq") * 10 > F.col("tq"))
            .select("l_suppkey").distinct())
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (s.join(cand, s["s_suppkey"] == cand["l_suppkey"], "left_semi")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))


@_q("v15_tpch_q7", """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
 JOIN orders o ON o.o_orderkey = l.l_orderkey
 JOIN customer c ON c.c_custkey = o.o_custkey
 JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
 JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""")
def q_tpch_q7(spark, sf):
    """TPC-H Q7 (volume shipping): revenue between two nations by
    year and direction. Fact joins shuffle; all four dims broadcast."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01"))
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("_sk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("_ck"),
                  F.col("n_name").alias("cust_nation"))
    j = (l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
         .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
         .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
         .filter(((F.col("supp_nation") == "NATION_1")
                  & (F.col("cust_nation") == "NATION_2"))
                 | ((F.col("supp_nation") == "NATION_2")
                    & (F.col("cust_nation") == "NATION_1"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@_q("v16_tpch_q8", """
WITH vol AS (
 SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        l.l_extendedprice * (1 - l.l_discount) AS volume,
        n2.n_name AS supp_nation
 FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
 WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
   AND o.o_orderdate >= TIMESTAMP '1996-01-01'
   AND o.o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                      ELSE 0 END) / SUM(volume), 6) AS mkt_share
FROM vol GROUP BY 1
""")
def q_tpch_q8(spark, sf):
    """TPC-H Q8 (national market share): 7-way star join, conditional
    share-of-total per year."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_type") == "PROMO") \
        .select("p_partkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n1 = (n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
          .select(F.col("n_nationkey").alias("_ck_n")))
    n2 = n.select(F.col("n_nationkey").alias("_sk_n"),
                  F.col("n_name").alias("supp_nation"))
    j = (l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
         .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
         .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_ck_n"))
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sk_n")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (j.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                      .otherwise(F.lit(0.0))) / F.sum(vol), 6)
                .alias("mkt_share")))


@_q("v17_tpch_q9", """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) * 10
                 - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT) * 100)
             / 100000.0, 2) AS profit
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
 JOIN supplier s ON s.s_suppkey = l.l_suppkey
 JOIN orders o ON o.o_orderkey = l.l_orderkey
 JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_type IN ('PROMO', 'SMALL')
GROUP BY 1, 2
""")
def q_tpch_q9(spark, sf):
    """TPC-H Q9 (product-type profit): profit expression per supplier
    nation and order year; 0.1·retailprice·qty stands in for the
    partsupp supplycost (no partsupp table in the fixture)."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(
        F.col("p_type").isin("PROMO", "SMALL")) \
        .select("p_partkey", "p_retailprice")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf, "nation").select("n_nationkey",
                                         F.col("n_name").alias("nation"))
    j = (l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
         .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
         .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")))
    # Exact int64 fixed-point (1e-5 dollars): the revenue-minus-cost
    # cancellation otherwise lands on the half-cent boundary and the
    # two engines' float sum orders disagree in the last cent.
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    retail_c = F.round(F.col("p_retailprice") * 100).cast("long")
    qty_i = F.col("l_quantity").cast("long")
    profit_scaled = (price_c * (F.lit(100) - disc_c) * F.lit(10)
                     - retail_c * qty_i * F.lit(100))
    return (j.groupBy("nation",
                      F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(F.sum(profit_scaled) / F.lit(100000.0), 2)
                 .alias("profit")))


@_q("v18_tpch_q10", """
WITH rev AS (
 SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
 FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
 WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
   AND o.o_orderdate < TIMESTAMP '1997-07-01'
   AND l.l_returnflag = 'R'
 GROUP BY 1, 2, 3, 4)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM rev ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def q_tpch_q10(spark, sf):
    """TPC-H Q10 (returned-item reporting): top-20 customers by
    returned revenue in a two-quarter window; custkey tie-break."""
    l = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R") \
        .select("l_orderkey", "l_extendedprice", "l_discount")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")) \
        .select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    j = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]))
    rev = (j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue")))
    return (rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"))


# --- TPC-H shapes Q12/Q15/Q17/Q19/Q21 (round 3; adapted: no
# l_shipmode/l_commitdate/l_receiptdate columns, so Q12 groups by
# l_linestatus and Q21's lateness is shipdate > orderdate + 90 days —
# the priority-count, scalar-subquery-max, correlated-avg,
# disjunctive-predicate, and only-late-supplier shapes are intact).


@_q("v19_tpch_q12", """
SELECT l.l_linestatus AS ship_mode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY 1
""")
def q_tpch_q12(spark, sf):
    """TPC-H Q12 (shipping priority counts; l_linestatus stands in
    for l_shipmode)."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")) \
        .select("l_orderkey", "l_linestatus", "l_shipdate")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(F.col("l_shipdate") > F.col("o_orderdate"))
            .groupBy(F.col("l_linestatus").alias("ship_mode"))
            .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0)).cast("long")
                 .alias("low_line_count")))


@_q("v20_tpch_q15", """
WITH rev AS (SELECT l_suppkey,
                    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                        AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1997-04-01'
             GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""")
def q_tpch_q15(spark, sf):
    """TPC-H Q15 (top supplier): quarterly revenue per supplier,
    scalar-subquery max filter (whole-frame max via 1-row broadcast
    cross-join — no window over a single partition)."""
    l = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01"))
    rev = (l.groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("_mx"))
            .join(F.broadcast(s),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue"))


@_q("v21_tpch_q17", """
WITH pa AS (SELECT l_partkey, AVG(l_quantity) AS avg_qty
            FROM lineitem GROUP BY 1)
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
 JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11' AND l.l_quantity < 0.2 * pa.avg_qty
""")
def q_tpch_q17(spark, sf):
    """TPC-H Q17 (small-quantity-order revenue): correlated per-part
    average quantity; integer quantities make the avg exact in both
    engines, so the 0.2·avg comparison is engine-stable."""
    l = load(spark, sf, "lineitem")
    pa = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.avg("l_quantity").alias("avg_qty"))
    p = load(spark, sf, "part").filter(F.col("p_brand") == "Brand#11") \
        .select("p_partkey")
    j = (l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
         .join(pa, F.col("l_partkey") == F.col("_pk"))
         .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")))
    return j.agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly"),
                 F.count("*").cast("long").alias("n_lines"))


@_q("v22_tpch_q19", """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def q_tpch_q19(spark, sf):
    """TPC-H Q19 (disjunctive predicate revenue): three OR'd
    brand/size/quantity bands — the shape Catalyst must NOT turn into
    three scans."""
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    band = lambda b, smax, qlo, qhi: (
        (F.col("p_brand") == b) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    j = j.filter(band("Brand#12", 5, 1, 11)
                 | band("Brand#23", 10, 10, 20)
                 | band("Brand#24", 15, 20, 30))
    return j.agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").cast("long").alias("n_lines"))


@_q("v23_tpch_q21", """
WITH lo AS (SELECT l.l_orderkey, l.l_suppkey,
                   MAX(CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END) AS is_late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1, 2),
 ag AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
        FROM lo GROUP BY 1)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lo JOIN ag ON lo.l_orderkey = ag.l_orderkey
 JOIN supplier s ON s.s_suppkey = lo.l_suppkey
WHERE lo.is_late = 1 AND ag.n_supp > 1 AND ag.n_late = 1
GROUP BY 1
""")
def q_tpch_q21(spark, sf):
    """TPC-H Q21 (suppliers who kept orders waiting): the only-late
    supplier on multi-supplier finished orders — the EXISTS/NOT-EXISTS
    pair expressed as per-order supplier aggregates (lateness =
    shipdate > orderdate + 90 days; no commit/receipt dates in the
    fixture)."""
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F") \
        .select("o_orderkey", "o_orderdate")
    late = F.when(F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                  1).otherwise(0)
    lo = (l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(late).alias("is_late")))
    ag = lo.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (lo.join(ag, F.col("l_orderkey") == F.col("_ok"))
            .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1)
                    & (F.col("n_late") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count("*").cast("long").alias("numwait")))


@_q("x41_merge_upsert", """
WITH src AS (SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                    ROUND(o_totalprice + 1.5, 2) AS o_totalprice
             FROM orders WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey, o_custkey,
                    ROUND(o_totalprice * 2, 2) AS o_totalprice
             FROM orders WHERE o_orderkey % 7 = 0),
 tgt AS (SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2)
               AS o_totalprice FROM orders)
SELECT t.o_orderkey, t.o_custkey, t.o_totalprice FROM tgt t
WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = t.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice FROM src
""")
def q_merge_upsert(spark, sf):
    """MERGE/upsert snapshot: updates (orderkey % 7 = 0, doubled
    price) replace matching rows; inserts (shifted keys) append;
    everything else passes through."""
    from data_ingest_spark.extensions.cdc import merge_upsert
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"))
    inserts = (orders.filter(F.col("o_orderkey") % 10 == 0)
               .select((F.col("o_orderkey") + 1000000000)
                       .alias("o_orderkey"), "o_custkey",
                       F.round(F.col("o_totalprice") + 1.5, 2)
                       .alias("o_totalprice")))
    updates = (orders.filter(F.col("o_orderkey") % 7 == 0)
               .select("o_orderkey", "o_custkey",
                       F.round(F.col("o_totalprice") * 2, 2)
                       .alias("o_totalprice")))
    return merge_upsert(orders, inserts.unionByName(updates),
                        ["o_orderkey"])


@_q("v7_scalar_functions", """
SELECT o_orderkey,
       regexp_matches(o_orderpriority, '^[12]') AS is_urgent,
       o_orderstatus || ':' || o_orderpriority AS status_pri,
       ROUND(log10(o_totalprice), 6) AS log_price,
       CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END
           AS size_class,
       lower(o_orderpriority) AS pri_lower,
       md5(CAST(o_orderkey AS VARCHAR)) AS key_hash,
       CAST(EXTRACT(year FROM o_orderdate::TIMESTAMP) AS BIGINT)
           AS order_year,
       CAST(EXTRACT(month FROM o_orderdate::TIMESTAMP) AS BIGINT)
           AS order_month,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
       substr(CAST(o_orderkey AS VARCHAR), 1, 2) AS key_prefix
FROM orders WHERE o_orderkey % 100 = 0
""")
def q_scalar_functions(spark, sf):
    """X1–X9 scalar families in one oracle-checked row set: regex
    predicate, string concat/lower/substr, math (log10/round), CASE,
    hashing (md5), timestamp extraction, casts — all whole-stage
    codegen, map-only, filter pushed to the scan."""
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 100 == 0)
    if dict(o.dtypes).get("o_orderdate") == "bigint":
        o = o.withColumn("o_orderdate",
                         F.timestamp_micros(F.expr("o_orderdate div 1000")))
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").rlike("^[12]").alias("is_urgent"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority")
        .alias("status_pri"),
        F.round(F.log10("o_totalprice"), 6).alias("log_price"),
        F.when(F.col("o_totalprice") > 150000, "big").otherwise("small")
        .alias("size_class"),
        F.lower("o_orderpriority").alias("pri_lower"),
        F.md5(F.col("o_orderkey").cast("string").cast("binary"))
        .alias("key_hash"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.substring(F.col("o_orderkey").cast("string"), 1, 2)
        .alias("key_prefix"))


@_q("x42_ann_recall", f"""
WITH q AS (SELECT vec_id AS query_id, label, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE {_ANN_Q}),
 c AS (SELECT vec_id AS neighbor_id, label, embedding::DOUBLE[] AS cv
       FROM embeddings),
 es AS (SELECT q.query_id, c.neighbor_id, {_COS} AS cosine
        FROM q CROSS JOIN c WHERE c.neighbor_id <> q.query_id),
 er AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS rank FROM es),
 vs AS (SELECT q.query_id, c.neighbor_id, {_COS} AS cosine
        FROM q JOIN c ON q.label = c.label
        WHERE c.neighbor_id <> q.query_id),
 vr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS rank FROM vs),
 ex AS (SELECT query_id, neighbor_id FROM er WHERE rank <= 5),
 ap AS (SELECT query_id, neighbor_id FROM vr WHERE rank <= 5),
 hit AS (SELECT e.query_id, COUNT(a.neighbor_id) AS n_hit
         FROM ex e LEFT JOIN ap a
           ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         GROUP BY 1)
SELECT query_id, CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(n_hit / 5.0, 6) AS recall_at_5
FROM hit
""")
def q_ann_recall(spark, sf):
    """ANN quality evaluation under the oracle: per-query recall@5 of
    the IVF index versus exact brute-force — the measurement that
    decides whether a bucketed index is good enough to replace the
    exact path at scale. Exact and approximate top-k both come from
    the library operators; the join+count is integer-exact."""
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("embedding").alias("query_vec"))
    exact = sim.cosine_topk(emb, queries.drop("label"), k=5).select(
        "query_id", "neighbor_id")
    approx = sim.cosine_topk_ivf(emb, queries, k=5).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an"))
    hits = (exact.join(approx,
                       (F.col("query_id") == F.col("aq"))
                       & (F.col("neighbor_id") == F.col("an")), "left")
            .groupBy("query_id")
            .agg(F.count("an").alias("n_hit")))
    return hits.select("query_id", "n_hit",
                       F.round(F.col("n_hit") / 5.0, 6).alias("recall_at_5"))


@_q("e14_cube", """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(CAST(user_id % 10 AS VARCHAR), '<all>') AS user_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(user_id % 10 AS VARCHAR))
""")
def q_cube(spark, sf):
    """CUBE grouping sets: all 2^2 aggregation granularities in one
    pass (Expand + single shuffle), NULL roll-up slots labeled."""
    ev = load(spark, sf, "events").withColumn(
        "user_mod", (F.col("user_id") % 10).cast("string"))
    return (ev.cube("event_type", "user_mod")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.coalesce("event_type", F.lit("<all>"))
                    .alias("event_type"),
                    F.coalesce("user_mod", F.lit("<all>"))
                    .alias("user_mod"),
                    "n", "total_value"))


@_q("e15_unpivot", """
SELECT o_orderkey, kind, ROUND(val, 2) AS val
FROM (SELECT o_orderkey, ROUND(o_totalprice, 2) AS price,
             CAST(o_custkey AS DOUBLE) AS cust
      FROM orders WHERE o_orderkey % 50 = 0)
UNPIVOT (val FOR kind IN (price, cust))
""")
def q_unpivot(spark, sf):
    """UNPIVOT/melt: wide columns → (key, kind, val) long rows via
    the native unpivot (stack) — scan-side, no shuffle."""
    o = (load(spark, sf, "orders")
         .filter(F.col("o_orderkey") % 50 == 0)
         .select("o_orderkey",
                 F.round("o_totalprice", 2).alias("price"),
                 F.col("o_custkey").cast("double").alias("cust")))
    return (o.unpivot("o_orderkey", ["price", "cust"], "kind", "val")
            .select("o_orderkey", "kind", F.round("val", 2).alias("val")))


@_q("x43_count_min", """
WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
              FROM documents),
 cells AS (SELECT r.r AS row,
                  CAST(concat('0x', substr(md5(CAST(r.r AS VARCHAR) || ':'
                       || tok), 1, 7)) AS BIGINT) % 1024 AS pos,
                  COUNT(*) AS cell_count
           FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
           GROUP BY 1, 2),
 probes AS (SELECT DISTINCT tok FROM toks ORDER BY tok LIMIT 20),
 est AS (SELECT p.tok, MIN(COALESCE(c.cell_count, 0)) AS est_count
         FROM probes p CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
         LEFT JOIN cells c
           ON c.row = r.r
          AND c.pos = CAST(concat('0x', substr(md5(CAST(r.r AS VARCHAR)
                      || ':' || p.tok), 1, 7)) AS BIGINT) % 1024
         GROUP BY 1),
 exact AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY 1)
SELECT e.tok AS token, CAST(e.est_count AS BIGINT) AS est_count,
       CAST(x.true_count AS BIGINT) AS true_count
FROM est e JOIN exact x ON x.tok = e.tok
""")
def q_count_min(spark, sf):
    """Count-Min sketch: build the 4×1024 integer cell state over the
    token stream, estimate the 20 lexicographically-first tokens, and
    emit estimate vs truth (est >= true by construction; both exact
    integers, so the sketch itself is oracle-checked)."""
    from data_ingest_spark.extensions.sketches import (count_min_build,
                                                       count_min_estimate)
    from data_ingest_spark.extensions.text import tokens_col
    toks = (load(spark, sf, "documents")
            .select(F.explode(tokens_col("text")).alias("token")))
    sketch = count_min_build(toks, "token")
    probes = (toks.select("token").distinct()
              .orderBy("token").limit(20))
    est = count_min_estimate(sketch, probes, "token")
    exact = toks.groupBy("token").agg(F.count("*").alias("true_count"))
    return (est.join(exact, "token")
            .select("token", F.col("est_count").cast("long").alias("est_count"),
                    F.col("true_count").cast("long").alias("true_count")))


@_q("x44_bloom_prune", """
WITH keys AS (SELECT DISTINCT c_custkey FROM customer
              WHERE c_mktsegment = 'BUILDING'),
 bloom AS (SELECT DISTINCT
             CAST(concat('0x', substr(md5(CAST(r.r AS VARCHAR) || ':'
                  || CAST(c_custkey AS VARCHAR)), 1, 7)) AS BIGINT) % 4096
               AS pos
           FROM keys CROSS JOIN (VALUES (0), (1), (2)) r(r)),
 probe AS (SELECT o_orderkey, o_custkey FROM orders),
 passed AS (SELECT p.o_orderkey, p.o_custkey FROM probe p
            WHERE NOT EXISTS (
              SELECT 1 FROM (VALUES (0), (1), (2)) r(r)
              WHERE CAST(concat('0x', substr(md5(CAST(r.r AS VARCHAR) || ':'
                    || CAST(p.o_custkey AS VARCHAR)), 1, 7)) AS BIGINT)
                    % 4096 NOT IN (SELECT pos FROM bloom))),
 truth AS (SELECT o_orderkey FROM probe
           WHERE o_custkey IN (SELECT c_custkey FROM keys))
SELECT CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
       CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass,
       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       CAST((SELECT COUNT(*) FROM passed) -
            (SELECT COUNT(*) FROM truth) AS BIGINT) AS n_false_pos
""")
def q_bloom_prune(spark, sf):
    """Bloom-filter join pruning: a 4096-bit filter over BUILDING
    customers prunes the orders probe side before any join. No false
    negatives (every true match passes); the surviving excess is the
    bounded false-positive set — all four counts integer-exact."""
    from data_ingest_spark.extensions.sketches import (bloom_build,
                                                       bloom_prune)
    keys = (load(spark, sf, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey").distinct())
    bloom = bloom_build(keys, "c_custkey")
    probe = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    passed = bloom_prune(probe, bloom, "o_custkey")
    truth = probe.join(keys, probe["o_custkey"] == keys["c_custkey"],
                       "left_semi")
    return (probe.agg(F.count("*").alias("n_probe"))
            .crossJoin(passed.agg(F.count("*").alias("n_pass")))
            .crossJoin(truth.agg(F.count("*").alias("n_true")))
            .select("n_probe", "n_pass", "n_true",
                    (F.col("n_pass") - F.col("n_true"))
                    .alias("n_false_pos")))


@_q("x45_semantic_dedup", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 b AS (SELECT vec_id, v, {_planes_sql()} AS bkt FROM e),
 prs AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b
         FROM b a JOIN b c ON a.bkt = c.bkt AND a.vec_id < c.vec_id
         WHERE ROUND(list_dot_product(a.v, c.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) >= 0.35),
 edges AS (SELECT id_a AS src, id_b AS dst FROM prs
           UNION SELECT id_b, id_a FROM prs),
 nodes AS (SELECT DISTINCT src AS id FROM edges),
 walk AS (
   WITH RECURSIVE reach(src, dst) AS (
     SELECT id, id FROM nodes
     UNION
     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
   SELECT src, dst FROM reach),
 comp AS (SELECT src AS vec_id, MIN(dst) AS cluster FROM walk GROUP BY 1)
SELECT vec_id, cluster, vec_id = cluster AS kept FROM comp
""")
def q_semantic_dedup(spark, sf):
    """Semantic dedup end-to-end: LSH-bucketed embedding-cosine pairs
    → connected components → keep the minimum id per cluster. The
    composed kept/dropped decision — the final step of the
    embedding-tier dedup — under a full value oracle."""
    from data_ingest_spark.extensions.dedup import dup_clusters
    pairs = sim.embedding_near_dups(load(spark, sf, "embeddings"),
                                    threshold=0.35).select("id_a", "id_b")
    comp = dup_clusters(pairs, id_cols=("id_a", "id_b"))
    return comp.select(F.col("doc_id").alias("vec_id"), "cluster",
                       (F.col("doc_id") == F.col("cluster")).alias("kept"))


@_q("x46_importance_sample", f"""
WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk,
                  length(text) AS nc,
                  length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))
                    AS np
           FROM documents),
 m AS (SELECT doc_id, len(tk) AS n_tokens,
              np / nc AS pr,
              len(list_filter(tk, x -> list_contains({_STOP_SQL}, x)))
                / len(tk) AS sr
       FROM t),
 q AS (SELECT doc_id,
              ROUND(0.3 * least(1.0, n_tokens / 100.0)
                    + 0.4 * (1.0 - pr) + 0.3 * sr, 6) AS quality_score
       FROM m)
SELECT doc_id, quality_score
FROM q
WHERE CAST(concat('0x', substr(md5('21:' || CAST(doc_id AS VARCHAR)), 1, 7))
      AS BIGINT) % 10000
    < FLOOR(quality_score * quality_score * 10000)
""")
def q_importance_sample(spark, sf):
    """Quality-weighted sampling at temperature 2: keep probability =
    quality_score², decided content-addressed — the step that turns a
    quality signal into a training distribution, map-only and exactly
    reproducible."""
    from data_ingest_spark.extensions.sampling import importance_sample
    scored = tx.text_quality(load(spark, sf, "documents")).select(
        "doc_id", "quality_score")
    return importance_sample(scored, "quality_score", temperature=2.0)


@_q("x47_bigram_lm", """
WITH t AS (SELECT string_split_regex(lower(text), '\\s+') AS tk
           FROM documents),
 bg AS (SELECT unnest([{'w1': tk[i], 'w2': tk[i+1]}
                       FOR i IN generate_series(1, len(tk) - 1)],
                      recursive := true)
        FROM t WHERE len(tk) >= 2),
 c AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bg GROUP BY 1, 2),
 m AS (SELECT w1, SUM(pair_count) AS c1 FROM c GROUP BY 1)
SELECT c.w1, c.w2, CAST(c.pair_count AS BIGINT) AS pair_count,
       ROUND(c.pair_count / m.c1, 6) AS cond_prob
FROM c JOIN m ON m.w1 = c.w1
ORDER BY pair_count DESC, c.w1, c.w2 LIMIT 100
""")
def q_bigram_lm(spark, sf):
    """Bigram LM: corpus pair counts + P(w2|w1), top-100."""
    from data_ingest_spark.extensions.text import bigram_lm
    return bigram_lm(load(spark, sf, "documents"), top_k=100)


@_q("x48_diversity_sample", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 b AS (SELECT vec_id, {_planes_sql()} AS bucket FROM e)
SELECT bucket, MIN(vec_id) AS rep_id,
       CAST(COUNT(*) AS BIGINT) AS bucket_size
FROM b GROUP BY 1
""")
def q_diversity_sample(spark, sf):
    """Diversity-aware subset selection: one representative per
    semantic LSH bucket (min id) + bucket mass — the cheap
    coreset-style pick that spreads a sample across embedding-space
    regions instead of density peaks. Map-side bucket hash, one
    groupBy — no pairwise distances."""
    emb = load(spark, sf, "embeddings")
    planes = sim.hyperplanes(4, 64)
    bucketed = emb.select(
        "vec_id", sim.lsh_bucket_col("embedding", planes).alias("bucket"))
    return (bucketed.groupBy("bucket")
            .agg(F.min("vec_id").alias("rep_id"),
                 F.count("*").alias("bucket_size")))


@_q("x49_decayed_counts", """
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
 w AS (SELECT user_id,
         CAST(ROUND(exp(-0.6931471805599453 *
                (epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(ts))
                / 86400.0) * 1000000) AS BIGINT) AS wi
       FROM e WHERE ts <= TIMESTAMP '2024-02-01 00:00:00')
SELECT user_id, ROUND(SUM(wi) / 1000000, 6) AS decayed_count,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY 1
""")
def q_decayed_counts(spark, sf):
    """Recency-decayed per-user activity (half-life 1 day, as of
    2024-02-01): fixed-point per-row weights, exact integer sum."""
    from data_ingest_spark.extensions.profile import decayed_counts
    return decayed_counts(events_df(spark, sf), half_life_s=86400.0,
                          asof_expr="TIMESTAMP '2024-02-01 00:00:00'")


@_q("e16_json_props", """
SELECT event_type,
       CAST(CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS BIGINT)
         AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""")
def q_json_props(spark, sf):
    """Semi-structured payload parsing: the events ``props`` JSON
    string → typed field → bucketed aggregate. from_json with an
    explicit schema stays JVM-side (no UDF) and prunes to the one
    parsed field."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    schema = StructType([StructField("k", IntegerType())])
    ev = load(spark, sf, "events").withColumn(
        "_p", F.from_json("props", schema))
    return (ev.groupBy(
                "event_type",
                F.floor(F.col("_p.k") / 10).cast("long").alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value")))


@_q("v8_array_functions", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE vec_id % 25 = 0)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS dim,
       ROUND(v[1], 6) AS first_val,
       ROUND(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
       ROUND(list_aggregate(v, 'sum'), 6) AS sum_val,
       ROUND(list_aggregate(v, 'max'), 6) AS max_val,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive
FROM e
""")
def q_array_functions(spark, sf):
    """Higher-order array functions as an explicit oracle row: size,
    element access, dot-product norm, sequential fold (same fold order
    in both engines ⇒ identical doubles), filter count."""
    e = (load(spark, sf, "embeddings")
         .filter(F.col("vec_id") % 25 == 0)
         .select("vec_id",
                 F.col("embedding").cast("array<double>").alias("v")))
    dot = F.aggregate(F.zip_with("v", "v", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("v").cast("long").alias("dim"),
        F.round(F.element_at("v", 1), 6).alias("first_val"),
        F.round(F.sqrt(dot), 6).alias("l2_norm"),
        F.round(F.aggregate("v", F.lit(0.0), lambda a, x: a + x), 6)
        .alias("sum_val"),
        F.round(F.array_max("v"), 6).alias("max_val"),
        F.size(F.filter("v", lambda x: x > 0)).cast("long")
        .alias("n_positive"))


@_q("e17_datetime_functions", """
SELECT event_id,
       date_trunc('day', ts::TIMESTAMP) AS day,
       date_trunc('hour', ts::TIMESTAMP) AS hour,
       CAST(EXTRACT(dow FROM ts::TIMESTAMP) AS BIGINT) AS dow_sunday0,
       CAST(EXTRACT(hour FROM ts::TIMESTAMP) AS BIGINT) AS hour_of_day,
       CAST(EXTRACT(epoch FROM date_trunc('day', ts::TIMESTAMP))
            AS BIGINT) AS day_epoch
FROM events WHERE event_id % 97 = 0
""")
def q_datetime_functions(spark, sf):
    """Datetime family: truncation, day-of-week (normalized to
    Sunday=0 — Spark's dayofweek is Sunday=1), epoch extraction."""
    ev = events_df(spark, sf).filter(F.col("event_id") % 97 == 0)
    return ev.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        (F.dayofweek("ts") - 1).cast("long").alias("dow_sunday0"),
        F.hour("ts").cast("long").alias("hour_of_day"),
        F.unix_timestamp(F.date_trunc("day", "ts")).cast("long")
        .alias("day_epoch"))


@_q("x50_image_features", """
WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS nb FROM documents),
 tiled AS (SELECT doc_id,
             substring(repeat(substring(hx, 1, 128),
                       CAST(4096 // greatest(least(nb, 64), 1) AS INTEGER)
                       + 1), 1, 8192) AS hx2
           FROM d),
 px AS (SELECT doc_id,
               CAST(concat('0x', substr(hx2, 2 * i - 1, 2)) AS BIGINT) AS v
        FROM tiled CROSS JOIN (SELECT unnest(generate_series(1, 4096)) AS i))
SELECT doc_id,
       ROUND(SUM(v) / 4096.0, 6) AS mean_px,
       CAST(MIN(v) AS INTEGER) AS min_px,
       CAST(MAX(v) AS INTEGER) AS max_px,
       CAST(SUM(CASE WHEN v // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hist_0,
       CAST(SUM(CASE WHEN v // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hist_1,
       CAST(SUM(CASE WHEN v // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist_2,
       CAST(SUM(CASE WHEN v // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hist_3
FROM px GROUP BY doc_id
""")
def q_image_features(spark, sf):
    """decode(fake) → resize(64×64) → feature-extract: the full
    three-stage multimodal chain, last stage emitting mean/min/max
    intensity + 4-bin histogram — all integer-exact vs the hex-domain
    oracle."""
    docs = load(spark, sf, "documents").withColumn(
        "payload", F.col("text").cast("binary"))
    resized = mm.resize_image(mm.decode_image_fake(docs),
                              width=64, height=64)
    return mm.image_features(resized)


@_q("x91_image_decode_real", """
WITH p AS (SELECT doc_id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS width,
                  CAST(1 + doc_id % 7 AS INTEGER) AS height,
                  substr(repeat(md5(text), 9), 1,
                         CAST((1 + doc_id % 13) * (1 + doc_id % 7) * 3
                              AS INTEGER)) AS body
           FROM documents),
 px AS (SELECT doc_id, width, height,
               unnest(list_transform(range(1, len(body) + 1),
                      i -> ord(substr(body, i, 1)))) AS v
        FROM p)
SELECT doc_id, width, height,
       ROUND(SUM(v) * 1.0 / COUNT(*), 6) AS mean_px,
       CAST(MIN(v) AS INTEGER) AS min_px,
       CAST(MAX(v) AS INTEGER) AS max_px,
       CAST(SUM(CASE WHEN v // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS hist_0,
       CAST(SUM(CASE WHEN v // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hist_1,
       CAST(SUM(CASE WHEN v // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS hist_2,
       CAST(SUM(CASE WHEN v // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hist_3
FROM px GROUP BY 1, 2, 3
""")
def q_image_decode_real(spark, sf):
    """REAL image decode under a full value oracle (round-3 verdict
    #8): deterministic binary P6 PPM payloads are synthesized from
    each document (header with a comment line, md5-derived raster),
    decoded by the pure-numpy netpbm parser (`decode_payload` — no
    PIL), and summarized by image_features. The oracle recomputes the
    raster directly, so header parsing, dimension extraction, and the
    raster offset are all value-checked."""
    docs = load(spark, sf, "documents")
    w = (F.lit(1) + F.col("doc_id") % 13).cast("int")
    h = (F.lit(1) + F.col("doc_id") % 7).cast("int")
    body = F.repeat(F.md5(F.col("text").cast("binary")), 9).substr(
        F.lit(1), (w * h * 3).cast("int"))
    payload = F.concat(
        F.lit("P6\n# synthetic\n"), w.cast("string"), F.lit(" "),
        h.cast("string"), F.lit("\n255\n"), body).cast("binary")
    dec = mm.decode_image(
        docs.select("doc_id", payload.alias("payload")))
    feats = mm.image_features(dec)
    return (dec.select("doc_id", "width", "height")
            .join(feats, "doc_id"))


def _lloyd_d2_sql(qe: str, ce: str) -> str:
    return (f"CAST(list_sum(list_transform(range(1, 65), "
            f"j -> ({qe}[j] - {ce}[j]) * ({qe}[j] - {ce}[j]))) AS BIGINT)")


def _lloyd_iter_sql(i: int) -> str:
    """One unrolled Lloyd round: assign to prior centroids c{i-1},
    re-center as floor(sum/n) per dimension → c{i}."""
    return f"""
i{i} AS (SELECT q.vec_id, q.qe, c.cid,
              {_lloyd_d2_sql('q.qe', 'c.ce')} AS dd
       FROM q CROSS JOIN c{i - 1} c),
a{i} AS (SELECT vec_id, qe, cid FROM (
         SELECT vec_id, qe, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dd, cid) AS rk
         FROM i{i}) WHERE rk = 1),
c{i} AS MATERIALIZED (
  SELECT cid, list(m ORDER BY dim) AS ce FROM (
    SELECT cid, t.i AS dim,
           CAST(FLOOR(SUM(qe[t.i]) * 1.0 / COUNT(*)) AS BIGINT) AS m
    FROM a{i} CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) t
    GROUP BY cid, t.i) GROUP BY cid)"""


@_q("x51_kmeans_ivf", f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS ev,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id < 4),
{_lloyd_iter_sql(1)},
{_lloyd_iter_sql(2)},
i3 AS MATERIALIZED (
  SELECT q.vec_id, q.ev, c.cid, {_lloyd_d2_sql('q.qe', 'c.ce')} AS dd
  FROM q CROSS JOIN c2 c),
r3 AS (SELECT vec_id, ev, cid,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dd, cid) AS rk FROM i3),
asg AS (SELECT vec_id AS neighbor_id, ev AS cv, cid FROM r3 WHERE rk = 1),
pr AS (SELECT vec_id AS query_id, ev AS qv, cid FROM r3
       WHERE rk <= 2 AND {_ANN_Q}),
s AS (SELECT pr.query_id, a.neighbor_id,
             ROUND(list_dot_product(pr.qv, a.cv) /
                   (sqrt(list_dot_product(pr.qv, pr.qv)) *
                    sqrt(list_dot_product(a.cv, a.cv))), 6) AS cosine
      FROM pr JOIN asg a USING (cid)
      WHERE a.neighbor_id <> pr.query_id),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM s)
SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
""")
def q_kmeans_ivf(spark, sf):
    """End-to-end KMeans-IVF ANN under a FULL value oracle: the coarse
    quantizer is 2 unrolled fixed-point Lloyd iterations (seeds =
    ids < 4), nprobe=2 search over the trained cells — the oracle
    replays the identical training rounds in SQL. The Spark-ML-fit
    variant (`cosine_topk_kmeans_ivf`) stays the production path for
    arbitrary iteration counts; its recall is property-tested in
    test_extensions."""
    from data_ingest_spark.extensions.similarity import (
        cosine_topk_fixed_ivf)
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.expr(_ANN_Q)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    return cosine_topk_fixed_ivf(emb, queries, k=5, n_cells=4,
                                 n_iters=2, nprobe=2)


def _morton_sql_terms(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@_q("x52_zorder", f"""
SELECT o_orderkey,
       CAST({_morton_sql_terms('(o_custkey % 65536)',
                               '(CAST(FLOOR(o_totalprice) AS BIGINT) % 65536)')}
            AS BIGINT) AS zcode
FROM orders WHERE o_orderkey % 20 = 0
""")
def q_zorder(spark, sf):
    """Z-order clustering key: 16-bit Morton interleave of
    (custkey, price) — the layout key that makes min/max skipping work
    on both columns; bit arithmetic, exact across engines. (Disjoint
    OR terms ≡ the oracle's sum.)"""
    from data_ingest_spark.functions.partitioning import morton_code
    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        morton_code(F.col("o_custkey") % 65536,
                    F.floor("o_totalprice").cast("long") % 65536)
        .alias("zcode"))


@_q("v9_window_functions", """
WITH o AS (SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price
           FROM orders WHERE o_custkey % 40 = 0)
SELECT o_custkey, o_orderkey, price,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(LAG(price, 1, 0.0) OVER w, 2) AS prev_price,
       ROUND(LEAD(price, 1, 0.0) OVER w, 2) AS next_price,
       ROUND(SUM(price) OVER (PARTITION BY o_custkey ORDER BY price,
             o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY price, o_orderkey)
""")
def q_window_functions(spark, sf):
    """The analytic window-function family in one oracle row: ranking
    (row_number/rank/dense_rank), distribution (percent_rank /
    cume_dist / ntile), offsets (lag/lead), and a running frame — all
    per-key windows, parallel across customers."""
    w = W.partitionBy("o_custkey").orderBy("price", "o_orderkey")
    o = (load(spark, sf, "orders").filter(F.col("o_custkey") % 40 == 0)
         .select("o_custkey", "o_orderkey",
                 F.round("o_totalprice", 2).alias("price")))
    return o.select(
        "o_custkey", "o_orderkey", "price",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.lag("price", 1, 0.0).over(w), 2).alias("prev_price"),
        F.round(F.lead("price", 1, 0.0).over(w), 2).alias("next_price"),
        F.round(F.sum("price").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2)
        .alias("running_total"))


def _pq_oracle_sql() -> str:
    books = sim.pq_codebooks(64, 8, 16)
    rows = []
    for j, bk in enumerate(books):
        for c, vec in enumerate(bk):
            lst = "[" + ", ".join(str(x) for x in vec) + "]"
            n2 = sum(x * x for x in vec)
            rows.append(f"({j}, {c}, {n2}, {lst}::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH cb(j, c, norm2, w) AS (VALUES
  {values}),
 e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 seg AS (SELECT vec_id, cb.j, cb.c,
                ROUND(2 * list_dot_product(v[cb.j * 8 + 1 : cb.j * 8 + 8],
                                           cb.w) - cb.norm2, 6) AS score
         FROM e CROSS JOIN cb),
 pick AS (SELECT vec_id, j, c,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                    ORDER BY score DESC, c) AS rn
          FROM seg)
SELECT vec_id,
       string_agg(CAST(c AS VARCHAR), ',' ORDER BY j) AS pq_code
FROM pick WHERE rn = 1 GROUP BY vec_id
"""


@_q("x53_pq_encode", _pq_oracle_sql())
def q_pq_encode(spark, sf):
    """PQ encoding: 64-dim float vectors → 8 codes from deterministic
    codebooks (rounded-score argmax, exact across engines)."""
    return sim.pq_encode(load(spark, sf, "embeddings"))


def _pq_search_oracle_sql() -> str:
    books = sim.pq_codebooks(64, 8, 16)
    rows = []
    for j, bk in enumerate(books):
        for c, vec in enumerate(bk):
            lst = "[" + ", ".join(str(x) for x in vec) + "]"
            n2 = sum(x * x for x in vec)
            rows.append(f"({j}, {c}, {n2}, {lst}::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH cb(j, c, norm2, w) AS (VALUES
  {values}),
 e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 seg AS (SELECT vec_id, cb.j, cb.c,
                ROUND(2 * list_dot_product(v[cb.j * 8 + 1 : cb.j * 8 + 8],
                                           cb.w) - cb.norm2, 6) AS score
         FROM e CROSS JOIN cb),
 pick AS (SELECT vec_id, j, c,
                 ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                    ORDER BY score DESC, c) AS rn
          FROM seg),
 codes AS (SELECT vec_id, j, c FROM pick WHERE rn = 1),
 q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
 lut AS (SELECT q.query_id, cb.j, cb.c,
                CAST(FLOOR((2 * list_dot_product(
                       qv[cb.j * 8 + 1 : cb.j * 8 + 8], cb.w)
                     - cb.norm2) * 1000000 + 0.5) AS BIGINT) AS s_i
         FROM q CROSS JOIN cb),
 scored AS (SELECT l.query_id, cd.vec_id AS neighbor_id,
                   SUM(l.s_i) AS score_i
            FROM codes cd JOIN lut l ON l.j = cd.j AND l.c = cd.c
            WHERE cd.vec_id <> l.query_id
            GROUP BY 1, 2),
 rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score_i DESC, neighbor_id) AS rank
        FROM scored)
SELECT query_id, neighbor_id, CAST(score_i AS BIGINT) AS score_i,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 5
"""


@_q("x54_pq_search", _pq_search_oracle_sql())
def q_pq_search(spark, sf):
    """PQ asymmetric-distance search: integer LUT scores over the
    4-bit codes, top-5 per query — the complete compressed-domain ANN
    path under a full value oracle."""
    emb = load(spark, sf, "embeddings")
    qids = [r["vec_id"] for r in
            emb.filter(F.col("vec_id") % 50 == 0).select("vec_id")
            .collect()]
    return sim.pq_search(emb, qids, k=5)


@_q("x55_quantize_int8", """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
 s AS (SELECT vec_id, v,
              ROUND(list_aggregate(list_transform(v, x -> abs(x)), 'max')
                    / 127.0, 6) AS scale
       FROM e),
 q AS (SELECT vec_id, scale, v,
              list_transform(v, x -> greatest(-127.0,
                least(127.0, FLOOR(x / scale + 0.5)))) AS qv
       FROM s)
SELECT vec_id, scale,
       array_to_string(list_transform(qv,
         x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS q_csv,
       ROUND(list_aggregate(list_transform(list_zip(v, qv),
         p -> abs(p[1] - p[2] * scale)), 'max'), 6) AS max_err
FROM q
""")
def q_quantize_int8(spark, sf):
    """int8 embedding quantization with per-vector scale and a
    reconstruction-error audit column."""
    return sim.quantize_int8(load(spark, sf, "embeddings"))


@_q("u3_intersect_except", """
WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk
            FROM customer),
 sn AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
        WHERE s_acctbal > 4900.0)
SELECT 'both' AS which, nk FROM (SELECT nk FROM cn INTERSECT
                                 SELECT nk FROM sn) a
UNION ALL
SELECT 'cust_only' AS which, nk FROM (SELECT nk FROM cn EXCEPT
                                      SELECT nk FROM sn) b
""")
def q_intersect_except(spark, sf):
    """§2.6 set-operation surface beyond the reference: INTERSECT and
    EXCEPT (distinct semantics) over nation key sets, tagged and
    unioned into one result."""
    cn = (load(spark, sf, "customer")
          .select(F.col("c_nationkey").cast("long").alias("nk")).distinct())
    sn = (load(spark, sf, "supplier")
          .filter(F.col("s_acctbal") > 4900.0)
          .select(F.col("s_nationkey").cast("long").alias("nk")).distinct())
    both = cn.intersect(sn).select(F.lit("both").alias("which"), "nk")
    only = cn.subtract(sn).select(F.lit("cust_only").alias("which"), "nk")
    return both.unionByName(only)


@_q("e20_grouping_sets", """
WITH b AS (SELECT CAST(ts::TIMESTAMP::DATE AS VARCHAR) AS day,
                  event_type, user_id % 10 AS cohort, value FROM events)
SELECT COALESCE(day, 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(CAST(cohort AS VARCHAR), 'ALL') AS cohort,
       CAST(COUNT(value) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total_value
FROM b GROUP BY GROUPING SETS ((day, event_type), (event_type, cohort), ())
""")
def q_grouping_sets(spark, sf):
    """Explicit GROUPING SETS (neither pure rollup nor cube): the
    (day, type) and (type, cohort) marginals plus the grand total in
    ONE pass — the multi-marginal reporting shape."""
    b = load(spark, sf, "events").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        "event_type",
        (F.col("user_id") % 10).alias("cohort"),
        "value")
    b.createOrReplaceTempView("_gs_events")
    return spark.sql("""
        SELECT COALESCE(day, 'ALL') AS day,
               COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(CAST(cohort AS STRING), 'ALL') AS cohort,
               CAST(COUNT(value) AS BIGINT) AS n,
               ROUND(SUM(value), 2) AS total_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((day, event_type), (event_type, cohort), ())
    """)


@_q("x67_hierarchy_paths", """
WITH RECURSIVE edges AS (
  SELECT p_partkey AS child, p_partkey // 10 AS parent
  FROM part WHERE p_partkey >= 10
),
 paths(node, root, depth) AS (
  SELECT child, child, 0 FROM edges
  UNION ALL
  SELECT p.node, e.parent, p.depth + 1
  FROM paths p JOIN edges e ON e.child = p.root
  WHERE p.depth < 6
)
SELECT node, root AS ancestor, CAST(depth AS BIGINT) AS depth
FROM paths WHERE depth > 0
""")
def q_hierarchy_paths(spark, sf):
    """Recursive-CTE equivalent: all (node, ancestor, depth) pairs of
    the part-key decimal hierarchy (parent = key div 10). Spark has no
    WITH RECURSIVE; the expansion is the standard bounded iterative
    self-join with the frontier localCheckpoint'ed per level — the
    same linear-shuffle-per-level shape a billion-edge hierarchy
    needs. The DuckDB oracle IS a recursive CTE, so the driver checks
    the full transitive closure."""
    edges = (load(spark, sf, "part")
             .filter(F.col("p_partkey") >= 10)
             .select(F.col("p_partkey").alias("child"),
                     (F.col("p_partkey") / 10).cast("long").alias("parent"))
             ).localCheckpoint()
    frontier = edges.select(F.col("child").alias("node"),
                            F.col("parent").alias("ancestor"),
                            F.lit(1).alias("depth"))
    out = frontier
    for d in range(2, 7):  # oracle recursion bound: depth <= 6
        nxt = (frontier.join(
                   edges.select(F.col("child").alias("ancestor"),
                                F.col("parent").alias("_up")), "ancestor")
               .select("node", F.col("_up").alias("ancestor"),
                       F.lit(d).alias("depth")))
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt.localCheckpoint()
    return out.select("node", "ancestor", F.col("depth").cast("long"))


@_q("e21_range_frame", """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
           AS trailing_1h_sum,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS BIGINT) AS trailing_1h_n
FROM events
""")
def q_range_frame(spark, sf):
    """Time-RANGE window frames: per-user trailing-1-hour sum/count —
    the moving-aggregate shape ROWS frames cannot express (frame width
    is event-time, not row count). One shuffle on user_id; the frame
    scan is sort-local within the partition."""
    ev = load(spark, sf, "events")
    ev.createOrReplaceTempView("_rf_events")
    return spark.sql("""
        SELECT event_id, user_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW), 6) AS trailing_1h_sum,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS trailing_1h_n
        FROM _rf_events
    """)


@_q("x70_hll_accuracy", """
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_n,
       TRUE AS within_bound
FROM lineitem
""")
def q_hll_accuracy(spark, sf):
    """HLL quality gate, oracle-checkable the same way x57 checks
    MinHash recall: emit the EXACT distinct count (hash-matched
    against the oracle) plus a boolean asserting the engine's
    approx_count_distinct landed within 3x its configured 5% rsd.
    The approximate value itself can never hash-match — the bound
    check is the contract."""
    li = load(spark, sf, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_n"),
        F.approx_count_distinct("l_orderkey", rsd=0.05).alias("_approx"))
    return agg.select(
        "exact_n",
        (F.abs(F.col("_approx") - F.col("exact_n"))
         / F.col("exact_n") < 0.15).alias("within_bound"))


@_q("e22_approx_percentile_accuracy", """
WITH ex AS (SELECT quantile_cont(o_totalprice, 0.5) AS p50,
                   quantile_cont(o_totalprice, 0.95) AS p95,
                   MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
            FROM orders)
SELECT ROUND(p50, 2) AS exact_p50, ROUND(p95, 2) AS exact_p95,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM ex
""")
def q_approx_percentile_accuracy(spark, sf):
    """approx_percentile quality gate: exact p50/p95 (hash-matched)
    plus booleans asserting the sketch estimates fall within 5% of
    the exact values — the bound that justifies using the mergeable
    sketch at scale."""
    o = load(spark, sf, "orders")
    agg = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("_e50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("_e95"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("_a50"),
        F.expr("approx_percentile(o_totalprice, 0.95, 1000)").alias("_a95"))
    return agg.select(
        F.round("_e50", 2).alias("exact_p50"),
        F.round("_e95", 2).alias("exact_p95"),
        (F.abs(F.col("_a50") - F.col("_e50")) / F.col("_e50") < 0.05)
        .alias("p50_ok"),
        (F.abs(F.col("_a95") - F.col("_e95")) / F.col("_e95") < 0.05)
        .alias("p95_ok"))


@_q("e23_gap_fill", """
WITH d AS (SELECT user_id % 50 AS grp, ts::TIMESTAMP::DATE AS day,
                  value FROM events),
 spans AS (SELECT grp, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1),
 cal AS (SELECT grp, unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                     ::DATE AS day
         FROM spans),
 agg AS (SELECT grp, day, CAST(COUNT(*) AS BIGINT) AS n,
                ROUND(SUM(value), 2) AS total
         FROM d GROUP BY 1, 2)
SELECT c.grp, CAST(c.day AS VARCHAR) AS day,
       COALESCE(a.n, 0) AS n, COALESCE(a.total, 0.0) AS total
FROM cal c LEFT JOIN agg a ON a.grp = c.grp AND a.day = c.day
""")
def q_gap_fill(spark, sf):
    """Time-series gap filling: a dense per-group daily calendar from
    each group's min..max day, left-joined onto the actual daily
    aggregates with zero-fill — the resampling pass dashboards and
    window models need (a groupBy alone silently omits empty days).
    Calendar generation is sequence()+explode per group row — no
    driver loop, no cross join."""
    d = load(spark, sf, "events").select(
        (F.col("user_id") % 50).alias("grp"),
        F.col("ts").cast("date").alias("day"), "value")
    spans = d.groupBy("grp").agg(F.min("day").alias("lo"),
                                 F.max("day").alias("hi"))
    cal = spans.select(
        "grp", F.explode(F.expr(
            "sequence(lo, hi, interval 1 day)")).alias("day"))
    agg = d.groupBy("grp", "day").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total"))
    return (cal.join(agg, ["grp", "day"], "left")
            .select("grp", F.col("day").cast("string").alias("day"),
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.coalesce("total", F.lit(0.0)).alias("total")))


@_q("e24_mad_outliers", """
WITH med AS (SELECT o_orderpriority,
                    quantile_cont(o_totalprice, 0.5) AS med
             FROM orders GROUP BY 1),
 dev AS (SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
                ABS(o.o_totalprice - m.med) AS ad, m.med
         FROM orders o JOIN med m
           ON o.o_orderpriority = m.o_orderpriority),
 mad AS (SELECT o_orderpriority, quantile_cont(ad, 0.5) AS mad
         FROM dev GROUP BY 1)
SELECT d.o_orderpriority AS priority, d.o_orderkey AS orderkey,
       ROUND((d.o_totalprice - d.med) / (1.4826 * m.mad), 6)
           AS robust_z,
       (ABS(d.o_totalprice - d.med) > 3.0 * 1.4826 * m.mad)
           AS is_outlier
FROM dev d JOIN mad m ON d.o_orderpriority = m.o_orderpriority
""")
def q_mad_outliers(spark, sf):
    """Robust per-group outlier flagging: median + MAD (scaled by the
    1.4826 normal-consistency constant) instead of mean/stddev, so a
    few extreme rows cannot drag the threshold — the robust twin of
    the M4 regression band. Two exact-percentile aggregations plus a
    broadcast join back; parity of interpolated percentiles across
    engines is already pinned by e8."""
    o = load(spark, sf, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med"))
    dev = (o.join(F.broadcast(med), "o_orderpriority")
           .withColumn("ad", F.abs(F.col("o_totalprice") - F.col("med"))))
    mad = dev.groupBy(F.col("o_orderpriority").alias("_p")).agg(
        F.expr("percentile(ad, 0.5)").alias("mad"))
    return (dev.join(F.broadcast(mad),
                     F.col("o_orderpriority") == F.col("_p"))
            .select(F.col("o_orderpriority").alias("priority"),
                    F.col("o_orderkey").alias("orderkey"),
                    F.round((F.col("o_totalprice") - F.col("med"))
                            / (F.lit(1.4826) * F.col("mad")), 6)
                    .alias("robust_z"),
                    (F.abs(F.col("o_totalprice") - F.col("med"))
                     > F.lit(3.0) * F.lit(1.4826) * F.col("mad"))
                    .alias("is_outlier")))


@_q("x73_dq_checks", """
WITH base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS v_nn,
       CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                       OR o_totalprice > 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS v_rng,
       CAST(SUM(CASE WHEN o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
       CAST(SUM(CASE WHEN NOT (o_orderdate <= o_orderdate)
                     THEN 1 ELSE 0 END) AS BIGINT) AS v_expr
       FROM orders),
 uq AS (SELECT CAST(COALESCE(SUM(CASE WHEN k > 1 THEN k END), 0) AS BIGINT)
                 AS v_uq,
               CAST(COALESCE(SUM(k), 0) AS BIGINT) AS n_uq
        FROM (SELECT COUNT(*) AS k FROM orders GROUP BY o_orderkey))
SELECT rule, col AS "column", v AS n_violations, n AS n_rows,
       v = 0 AS pass
FROM (
  SELECT 'not_null' AS rule, 'o_custkey' AS col, v_nn AS v, n FROM base
  UNION ALL SELECT 'in_range', 'o_totalprice', v_rng, n FROM base
  UNION ALL SELECT 'in_set', 'o_orderstatus', v_set, n FROM base
  UNION ALL SELECT 'expression', 'date_sane', v_expr, n FROM base
  UNION ALL SELECT 'unique', 'o_orderkey', v_uq, n_uq FROM uq)
""")
def q_dq_checks(spark, sf):
    """Declarative data-quality report over orders: five rule kinds
    (null / range / set / expression / uniqueness), all row-local
    rules fused into ONE aggregation pass — integer-exact, so the
    full report hash-matches the oracle."""
    from data_ingest_spark.functions.quality import check
    o = load(spark, sf, "orders")
    return check(o, [
        {"rule": "not_null", "column": "o_custkey"},
        {"rule": "in_range", "column": "o_totalprice",
         "lo": 0.0, "hi": 1000000.0},
        {"rule": "in_set", "column": "o_orderstatus",
         "allowed": ["O", "F", "P"]},
        {"rule": "expression", "column": "date_sane",
         "expr": "o_orderdate <= o_orderdate"},
        {"rule": "unique", "column": "o_orderkey"},
    ])


@_q("x74_ppl_buckets", """
WITH toks AS (SELECT doc_id, lang,
                unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM documents),
 model AS (SELECT lang, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
 scal AS (SELECT lang, SUM(c) AS tot, COUNT(*) AS v FROM model GROUP BY 1),
 logp AS (SELECT m.lang, m.token,
                 CAST(ROUND(ln((m.c + 1.0) / (s.tot + s.v)) * 1000000)
                      AS BIGINT) AS logp_i
          FROM model m JOIN scal s ON m.lang = s.lang),
 scored AS (SELECT t.doc_id, t.lang,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(SUM(l.logp_i) / COUNT(*) / 1000000, 6)
                     AS avg_logprob
            FROM toks t
            JOIN logp l ON l.lang = t.lang AND l.token = t.token
            GROUP BY 1, 2)
SELECT doc_id, lang, n_tokens, avg_logprob,
       CASE NTILE(3) OVER (PARTITION BY lang
                           ORDER BY avg_logprob DESC, doc_id ASC)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
       END AS bucket
FROM scored
""")
def q_ppl_buckets(spark, sf):
    """CCNet-style per-language perplexity tertiles: each document
    scored under its own language's add-1 unigram LM (integer-exact
    fixed-point reduction), then NTILE(3) per language → head /
    middle / tail. The standard keep-head-and-middle curation gate."""
    from data_ingest_spark.extensions.text import perplexity_buckets
    return perplexity_buckets(load(spark, sf, "documents"))


@_q("p4_training_prep", """
WITH toks AS (SELECT doc_id, lang,
                unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM documents),
 model AS (SELECT lang, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
 scal AS (SELECT lang, SUM(c) AS tot, COUNT(*) AS v FROM model GROUP BY 1),
 logp AS (SELECT m.lang, m.token,
                 CAST(ROUND(ln((m.c + 1.0) / (s.tot + s.v)) * 1000000)
                      AS BIGINT) AS logp_i
          FROM model m JOIN scal s ON m.lang = s.lang),
 scored AS (SELECT t.doc_id, t.lang,
                   ROUND(SUM(l.logp_i) / COUNT(*) / 1000000, 6)
                     AS avg_logprob
            FROM toks t
            JOIN logp l ON l.lang = t.lang AND l.token = t.token
            GROUP BY 1, 2),
 bk AS (SELECT doc_id,
               NTILE(3) OVER (PARTITION BY lang
                              ORDER BY avg_logprob DESC, doc_id ASC) AS b
        FROM scored),
 gated AS (SELECT d.doc_id, d.text FROM documents d
           JOIN bk ON bk.doc_id = d.doc_id AND bk.b < 3),
 keep AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
 wt AS (SELECT g.doc_id,
               len(string_split_regex(lower(g.text), '\\s+')) AS n_tokens
        FROM gated g JOIN keep k ON k.doc_id = g.doc_id),
 r AS (SELECT doc_id, n_tokens,
              SUM(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
                AS start_tok
       FROM wt),
 s AS (SELECT doc_id, n_tokens,
              CAST(FLOOR(start_tok / 512.0) AS BIGINT) AS seq_id
       FROM r)
SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM s GROUP BY 1
""")
def q_training_prep(spark, sf):
    """The tokenizer-facing capstone: perplexity gate (drop the tail
    tertile per language) → exact dedup keep-first → whitespace token
    counts → contiguous 512-token sequence packing via the distributed
    prefix sum — reported per training sequence, full value oracle."""
    from data_ingest_spark.extensions.curate import training_prep
    return training_prep(load(spark, sf, "documents"))


@_q("x76_token_entropy", """
WITH toks AS (SELECT doc_id,
                unnest(string_split_regex(lower(text), '\\s+')) AS token
              FROM documents),
 hist AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(ln(SUM(c))
             - SUM(c * CAST(ROUND(ln(c) * 1000000) AS BIGINT))
               / SUM(c) / 1000000, 6) AS entropy
FROM hist GROUP BY doc_id
""")
def q_token_entropy(spark, sf):
    """Per-doc Shannon entropy of the token histogram (integer-exact
    fixed-point reduction) — the corpus-model-free degenerate-text
    flag."""
    from data_ingest_spark.extensions.text import token_entropy
    return token_entropy(load(spark, sf, "documents"))


@_q("e25_salted_agg", """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS count_value,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       ROUND(MIN(value), 6) AS min_value, ROUND(MAX(value), 6)
         AS max_value
FROM events GROUP BY 1
""")
def q_salted_agg(spark, sf):
    """Two-stage salted aggregation under the value oracle: the skew
    path for a monster grouping key (each key shards across 16
    partial groups, partials recombine exactly). The oracle is the
    plain GROUP BY — algebraic partials are shard-invariant, and the
    summed column is fixed-pointed so reassociation cannot move a
    ulp."""
    from data_ingest_spark.functions.partitioning import salted_agg
    ev = load(spark, sf, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = salted_agg(ev, ["event_type"],
                     {"value": "count", "cents": "sum"}, salt=16)
    mm = salted_agg(ev, ["event_type"], {"value": "min"}, salt=16).join(
        salted_agg(ev, ["event_type"], {"value": "max"}, salt=16),
        "event_type")
    return (out.join(mm, "event_type")
            .select("event_type",
                    F.col("count_value").cast("long").alias("count_value"),
                    F.col("sum_cents").cast("long").alias("sum_cents"),
                    F.round("min_value", 6).alias("min_value"),
                    F.round("max_value", 6).alias("max_value")))


@_q("e18_try_functions", """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN TRY_CAST(lang AS INTEGER) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_int_casts,
       CAST(SUM(CASE WHEN TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT)
                          = n_chars THEN 1 ELSE 0 END) AS BIGINT)
       AS roundtrip_casts,
       CAST(SUM(CASE WHEN (CASE WHEN n_chars % 7 = 0 THEN NULL
                           ELSE ROUND(n_chars / (n_chars % 7), 6) END)
                     IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       AS div_null_rows
FROM documents
""")
def q_try_functions(spark, sf):
    """Error-safe scalar family: try_cast on unparseable strings,
    cast round-trip, try_divide null-on-zero — the ANSI-adjacent
    behaviors a pipeline relies on instead of job-killing exceptions.
    DuckDB lacks try_divide, so the oracle guards the denominator
    with CASE; the null-ness contract is what's compared."""
    d = load(spark, sf, "documents")
    bad = F.expr("try_cast(lang AS int)").isNull().cast("long")
    rt = (F.expr("try_cast(cast(n_chars AS string) AS bigint)")
          == F.col("n_chars")).cast("long")
    div = F.round(F.try_divide(F.col("n_chars"),
                               F.col("n_chars") % 7), 6)
    return d.agg(F.count("*").alias("n_docs"),
                 F.sum(bad).alias("bad_int_casts"),
                 F.sum(rt).alias("roundtrip_casts"),
                 F.sum(div.isNull().cast("long")).alias("div_null_rows"))


@_q("x64_substring_dedup", f"""
WITH corpus AS ({_NEARDUP_SQL}),
 toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS tk FROM corpus),
 long_docs AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= 8),
 win AS (SELECT doc_id,
                unnest([struct_pack(pos := i - 1,
                         h := md5(array_to_string(tk[i:i+7], ' ')))
                        FOR i IN generate_series(1, len(tk) - 7)]) AS u
         FROM long_docs),
 sites AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM win),
 marked AS (SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY h
                                      ORDER BY doc_id, pos) AS rk,
                   COUNT(*) OVER (PARTITION BY h) AS n_sites
            FROM sites),
 spans AS (SELECT doc_id, pos FROM marked WHERE n_sites > 1 AND rk > 1),
 covered AS (SELECT DISTINCT doc_id,
                    unnest(generate_series(pos, pos + 7)) AS tpos
             FROM spans),
 tok_rows AS (SELECT doc_id,
                     unnest([struct_pack(tpos := i - 1, token := tk[i])
                             FOR i IN generate_series(1, len(tk))]) AS u
              FROM toks),
 trows AS (SELECT doc_id, u.tpos AS tpos, u.token AS token FROM tok_rows),
 kept AS (SELECT t.doc_id, t.tpos, t.token
          FROM trows t LEFT JOIN covered c
            ON t.doc_id = c.doc_id AND t.tpos = c.tpos
          WHERE c.doc_id IS NULL),
 agg AS (SELECT doc_id,
                array_to_string(list(token ORDER BY tpos), ' ') AS clean_text,
                COUNT(*) AS kept_n
         FROM kept GROUP BY 1),
 total AS (SELECT doc_id, len(tk) AS tot FROM toks)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.tot - COALESCE(a.kept_n, 0) AS BIGINT) AS n_removed
FROM total t LEFT JOIN agg a USING (doc_id)
""")
def q_substring_dedup(spark, sf):
    """Exact-substring dedup (duplicated 8-token windows removed,
    global-first occurrence kept) over the planted near-dup corpus —
    the n-gram-postings formulation of suffix-array training-data
    dedup."""
    return dd.substring_dedup(_neardup_corpus(spark, sf), n=8)


@_q("x65_line_boilerplate", f"""
WITH corpus AS ({_NEARDUP_SQL}),
 base AS (SELECT doc_id,
                 regexp_replace(text, '\\. ', chr(10), 'g') AS text
          FROM corpus),
 lns AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base),
 lrows AS (SELECT doc_id,
                  unnest([struct_pack(pos := i - 1, line := ls[i])
                          FOR i IN generate_series(1, len(ls))]) AS u
           FROM lns),
 trows AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM lrows),
 boiler AS (SELECT line FROM trows
            GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
 kept AS (SELECT t.doc_id, t.pos, t.line
          FROM trows t LEFT JOIN boiler b ON t.line = b.line
          WHERE b.line IS NULL),
 agg AS (SELECT doc_id,
                array_to_string(list(line ORDER BY pos), chr(10))
                  AS clean_text,
                COUNT(*) AS kept_n
         FROM kept GROUP BY 1),
 total AS (SELECT doc_id, len(ls) AS tot FROM lns)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(t.tot - COALESCE(a.kept_n, 0) AS BIGINT) AS n_removed_lines
FROM total t LEFT JOIN agg a USING (doc_id)
""")
def q_line_boilerplate(spark, sf):
    """CCNet-style line-level boilerplate removal over the planted
    near-dup corpus (sentences as lines): any line present in ≥2
    distinct docs is dropped everywhere."""
    base = _neardup_corpus(spark, sf).select(
        "doc_id",
        F.regexp_replace(F.col("text"), r"\. ", "\n").alias("text"))
    return dd.line_boilerplate_removal(base, min_docs=2)


_EXCERPT_SQL = (
    "SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 2000000, "
    "array_to_string(string_split_regex(text, '\\s+')[1:12], ' ') "
    "FROM documents WHERE doc_id % 10 = 0")


def _excerpt_corpus(spark, sf):
    docs = load(spark, sf, "documents").select("doc_id", "text")
    ex = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 12), " ")
        .alias("text"))
    return docs.unionByName(ex)


@_q("x69_containment", f"""
WITH corpus AS ({_EXCERPT_SQL}),{_shingle_ctes('corpus')},
 sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shx GROUP BY 1),
 rare AS (SELECT shingle FROM shx GROUP BY 1 HAVING COUNT(*) <= 1000),
 m AS (SELECT x.doc_id, x.shingle FROM shx x
       JOIN rare r ON r.shingle = x.shingle),
 inter AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
                  COUNT(*) AS i
           FROM m a JOIN m b ON a.shingle = b.shingle
                            AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
SELECT contained_id, container_id,
       ROUND(i / s.sz, 6) AS containment
FROM inter JOIN sizes s ON s.doc_id = contained_id
WHERE i / s.sz >= 0.8
""")
def q_containment(spark, sf):
    """Excerpt-containment dedup over a corpus with planted 12-token
    excerpts: every excerpt is flagged as contained in its source even
    though its Jaccard to the source is near zero."""
    return dd.containment_pairs(_excerpt_corpus(spark, sf),
                                threshold=0.8, max_df=1000)


@_q("x71_drop_contained", f"""
WITH corpus AS ({_EXCERPT_SQL}),{_shingle_ctes('corpus')},
 sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shx GROUP BY 1),
 rare AS (SELECT shingle FROM shx GROUP BY 1 HAVING COUNT(*) <= 1000),
 m AS (SELECT x.doc_id, x.shingle FROM shx x
       JOIN rare r ON r.shingle = x.shingle),
 inter AS (SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
                  COUNT(*) AS i
           FROM m a JOIN m b ON a.shingle = b.shingle
                            AND a.doc_id <> b.doc_id
           GROUP BY 1, 2),
 pairs AS (SELECT contained_id, container_id
           FROM inter JOIN sizes s ON s.doc_id = contained_id
           WHERE i / s.sz >= 0.8),
 mutual AS (SELECT p.contained_id, p.container_id FROM pairs p
            WHERE EXISTS (SELECT 1 FROM pairs q
                          WHERE q.contained_id = p.container_id
                            AND q.container_id = p.contained_id)),
 drop_ids AS (
   -- pair-level anti-join, NOT a projected EXCEPT: a doc non-mutually
   -- contained in one container must drop even when it ALSO sits in a
   -- mutual pair with a third doc (projecting before EXCEPT would
   -- exempt it — divergence surfaced by the sf0.1 gate).
   SELECT contained_id FROM pairs p
   WHERE NOT EXISTS (SELECT 1 FROM mutual m
                     WHERE m.contained_id = p.contained_id
                       AND m.container_id = p.container_id)
   UNION SELECT contained_id FROM mutual
         WHERE contained_id > container_id)
SELECT c.doc_id FROM corpus c
LEFT JOIN drop_ids d ON d.contained_id = c.doc_id
WHERE d.contained_id IS NULL
""")
def q_drop_contained(spark, sf):
    """The containment KEEP-set: the excerpt corpus minus every doc
    ≥0.8-contained in another (mutual-containment ties keep the
    smaller id)."""
    return dd.remove_contained(_excerpt_corpus(spark, sf),
                               threshold=0.8).select("doc_id")


@_q("x72_leakage_safe_split", """
WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL
                SELECT doc_id + 1000000, text
                FROM documents WHERE doc_id % 10 = 0),
 groups AS (SELECT md5(text) AS h, MIN(doc_id) AS keep, COUNT(*) AS n
            FROM corpus GROUP BY 1 HAVING COUNT(*) > 1),
 prs AS (SELECT g.keep AS id_a, c.doc_id AS id_b
         FROM groups g JOIN corpus c ON md5(c.text) = g.h
         WHERE c.doc_id > g.keep),
 edges AS (SELECT id_a AS src, id_b AS dst FROM prs
           UNION SELECT id_b, id_a FROM prs),
 nodes AS (SELECT DISTINCT src AS id FROM edges),
 walk AS (
   WITH RECURSIVE reach(src, dst) AS (
     SELECT id, id FROM nodes
     UNION
     SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
   SELECT src, dst FROM reach),
 cl AS (SELECT src AS doc_id, MIN(dst) AS cluster FROM walk GROUP BY 1),
 rep AS (SELECT c.doc_id, COALESCE(cl.cluster, c.doc_id) AS rep
         FROM corpus c LEFT JOIN cl ON cl.doc_id = c.doc_id),
 b AS (SELECT doc_id, rep, {bkt} AS bkt FROM rep)
SELECT doc_id, rep,
       CASE WHEN bkt < 8000 THEN 'train'
            WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
FROM b
""".format(bkt=_bucket_sql("rep", 42)))
def q_leakage_safe_split(spark, sf):
    """Dedup-aware split: exact-dup clusters of the planted corpus all
    land in one split (split keyed on the cluster-minimum id), so
    duplicated content cannot straddle train/test. Full value oracle:
    per-doc (rep, split) assignment."""
    from data_ingest_spark.extensions.sampling import leakage_safe_split
    corpus = _dup_corpus(spark, sf)
    pairs = (dd.exact_dedup(corpus)
             .join(corpus.select(F.col("doc_id").alias("id_b"),
                                 F.md5(F.col("text").cast("binary"))
                                 .alias("content_hash")), "content_hash")
             .filter(F.col("id_b") > F.col("keep_id"))
             .select(F.col("keep_id").alias("id_a"), "id_b"))
    out = leakage_safe_split(
        corpus, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42)
    return out.select("doc_id", "rep", "split")


@_q("x56_intra_repetition", r"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
              FROM documents),
 ng AS (SELECT doc_id,
               array_to_string(t[u.i:least(u.i + 1, len(t))], ' ') AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - 1, 1))) AS u(i))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       ROUND((COUNT(*) - COUNT(DISTINCT g)) * 1.0 / COUNT(*), 6)
       AS dup_ngram_ratio
FROM ng GROUP BY doc_id
""")
def q_intra_repetition(spark, sf):
    """Gopher-style intra-document repetition: fraction of word
    bigrams repeated within the same doc. Map-only scan-speed gate."""
    from data_ingest_spark.extensions.text import intra_doc_repetition
    return intra_doc_repetition(load(spark, sf, "documents"), k=2)


