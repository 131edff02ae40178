"""Record-linkage quickstart: the entity-resolution side of the engine.

Reads the harness's customer/documents parquet and runs the linkage
story end-to-end: cheap blocking → Fellegi–Sunter probabilistic
scoring with per-decision summaries → a sorted-neighborhood pass over
a text corpus as the complementary blocking strategy → winnowing
fingerprints + df-capped posting lists as the content-level near-dup
check → connected-component consolidation of the accepted pairs into
entities.

    python examples/linkage_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from data_ingest_spark.extensions.dedup import (blocked_pairs,
                                                    dup_clusters,
                                                    fellegi_sunter_score,
                                                    fingerprint_pairs,
                                                    sorted_neighborhood_pairs)
    from data_ingest_spark.extensions.text import winnowing_fingerprints
    from data_ingest_spark.session import get_spark

    spark = get_spark("linkage-quickstart")
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "text")

    # 1. Structured linkage: block on (nation, balance bucket), score
    #    three comparison features with Fellegi–Sunter weights.
    pairs = blocked_pairs(
        cust.withColumn("_blk",
                        F.floor(F.col("c_acctbal") / 500).cast("int")),
        ["c_nationkey", "_blk"], id_col="c_custkey")
    feats = (pairs
             .withColumn("f_seg", F.col("c_mktsegment_a")
                         == F.col("c_mktsegment_b"))
             .withColumn("f_bal", F.abs(F.col("c_acctbal_a")
                                        - F.col("c_acctbal_b")) < 50.0)
             .withColumn("f_key", F.abs(F.col("c_custkey_a")
                                        - F.col("c_custkey_b")) < 100))
    scored = fellegi_sunter_score(feats, ["f_seg", "f_bal", "f_key"],
                                  m=[0.95, 0.8, 0.6], u=[0.2, 0.05, 0.01])
    print("=== Fellegi–Sunter decisions ===")
    scored.groupBy("decision").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg("weight"), 3).alias("avg_weight")) \
        .orderBy("decision").show(truncate=False)

    # 2. Text linkage, blocking strategy A: sorted neighborhood on a
    #    prefix key, Levenshtein verification within the window.
    snm = sorted_neighborhood_pairs(
        docs, F.lower(F.substring(F.col("text"), 1, 30)), window=3)
    snm_hits = (snm.select(
        "doc_id_a", "doc_id_b",
        F.levenshtein(F.substring("text_a", 1, 60),
                      F.substring("text_b", 1, 60)).alias("lev"))
        .filter(F.col("lev") <= 20))
    print("=== sorted-neighborhood candidate hits ===")
    print("pairs within lev<=20:", snm_hits.count())

    # 3. Text linkage, blocking strategy B: winnowing fingerprints.
    #    The synthetic corpus shares a lot of phrasing, so demand a
    #    STRONG overlap (>= 60 shared fingerprints) — at 10 the
    #    common-phrase pairs chain most of the corpus into one entity.
    win_pairs = fingerprint_pairs(winnowing_fingerprints(docs),
                                  min_shared=60, max_df=50)
    print("=== winnowing near-dup pairs ===")
    win_pairs.orderBy(F.col("n_shared").desc()).show(5, truncate=False)

    # 4. Consolidate accepted pairs into entities (min-label CC).
    accepted = (snm_hits.select(F.col("doc_id_a").alias("id_a"),
                                F.col("doc_id_b").alias("id_b"))
                .unionByName(win_pairs.select("id_a", "id_b"))
                .distinct())
    ents = dup_clusters(accepted)
    print("=== consolidated entities (largest first) ===")
    (ents.groupBy("cluster").agg(F.count("*").alias("n_members"))
     .orderBy(F.col("n_members").desc(), "cluster").show(5))

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
