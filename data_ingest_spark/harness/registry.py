"""Query registry: one named entry per implemented operator.

Each entry is ``name -> (spark_builder, oracle_sql | None)`` where
``spark_builder(spark, sf_dir) -> DataFrame`` exercises the operator
library and ``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs on
the same parquet tables (views: region nation customer supplier part
orders lineitem events documents embeddings).

Mapping of the reference's data model onto the synthetic tables
(FIXTURES.md §C): the long ``expression(sample, barcode, gene, count)``
table is lineitem with sample=l_returnflag, barcode=l_orderkey,
gene=l_partkey, count=l_quantity; "MT genes" are partkeys divisible by
13; dimension joins use nation/region/part; per-"sample" grouping maps
to returnflag/orderpriority.

Determinism rules (both engines must hash identically):
- every computed float is rounded (6dp for per-row math whose
  cross-engine error is ~1 ulp; 2dp for large money sums);
- every top-k / rank has an explicit unique tie-break column;
- BH-FDR needs no tie-break: the suffix-min provably assigns equal
  FDR to tied p-values regardless of rank permutation;
- only functions with identical semantics in Spark SQL and DuckDB are
  used inside checked expressions (arithmetic, ln/exp/sqrt/abs, md5,
  string concat of canonically-formatted integers).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from data_ingest_spark.operators import (emptydrops as ed, filters as fl,
                                         joins as jn, merge as mg,
                                         metrics as mx, normalize as nz,
                                         regression as rg, windows as wd)

Builder = Callable[[SparkSession, str], DataFrame]
# name -> (builder, oracle_sql | None)
REGISTRY: dict[str, tuple[Builder, str | None]] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def expr_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as the long expression table (FIXTURES.md §C)."""
    return load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("sample"),
        F.col("l_orderkey").alias("barcode"),
        F.col("l_partkey").alias("gene"),
        F.col("l_quantity").alias("count"),
    )


def _q(name: str, sql: str | None = None):
    def deco(fn: Builder) -> Builder:
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


_EXPR_SQL = ("SELECT l_returnflag AS sample, l_orderkey AS barcode, "
             "l_partkey AS gene, l_quantity AS cnt FROM lineitem")


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts normalized to a microsecond TIMESTAMP (the file
    stores TIMESTAMP(NANOS), which Spark reads as long nanos under the
    nanosAsLong flag; truncation toward zero matches DuckDB's
    ns→µs cast)."""
    ev = load(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


# Family modules register their queries into REGISTRY at import time.
# Import order preserves the historical registration order (the
# driver-sample prefix is pinned separately by _ROUND6_PRIORITY).
from data_ingest_spark.harness import q_core      # noqa: E402,F401
from data_ingest_spark.harness import q_extensions  # noqa: E402,F401
from data_ingest_spark.harness import q_events    # noqa: E402,F401
from data_ingest_spark.harness import q_ml        # noqa: E402,F401
from data_ingest_spark.harness import q_analytics  # noqa: E402,F401
from data_ingest_spark.harness import q_curation  # noqa: E402,F401
from data_ingest_spark.harness import q_round6   # noqa: E402,F401

# Driver-sample ordering. The correctness driver checks a bounded
# prefix of ``queries()`` each round; rounds 2-4 verified 150 distinct
# queries (CORRECTNESS_r02/r03/r04, 0 failures in any round). Round 5
# fronts EXACTLY the oracled remainder that has never received a
# driver verdict: registry minus the union of CORRECTNESS_r02-r05
# keys = 50 queries, which fills the driver's 50-slot sample with no
# waste and no new-query displacement (round-5 verdict ask #1: "front
# NOTHING else"). After a green CORRECTNESS_r06, every full-oracle
# query in the registry has a driver verdict (249/249); only the 8
# declared rows-only m-queries remain outside. Ordering within the
# 50: e-family stragglers, the x10-x76 mid-band numerically, then the
# set-op / curation composites. Every name carries a full DuckDB
# value oracle and passed the builder's full local gates at BOTH
# sf0.01 and sf0.1 (COVERAGE.md).
_ROUND6_PRIORITY = [
    # e-family analytics never sampled
    "e22_approx_percentile_accuracy", "e23_gap_fill",
    "e24_mad_outliers", "e25_salted_agg", "e26_incremental_rollup",
    # the x10-x76 mid-band (multimodal, sampling, dedup variants,
    # PQ/quant, data-quality), numeric order
    "x10_fingerprint", "x12_multimodal_meta", "x13_frame_sample",
    "x14_resize_image", "x17_embedding_dups", "x19_stratified_sample",
    "x20_incremental_dedup", "x22_quality_deciles", "x23_snapshot_diff",
    "x24_fuzzy_join", "x25_audio_features", "x27_weighted_mix",
    "x28_chunking", "x29_stratified_quota", "x30_profile",
    "x31_vocab_topk", "x32_negative_samples", "x35_pii_redact",
    "x36_bpe_pairs", "x37_token_drift", "x39_unigram_logprob",
    "x40_boilerplate", "x41_merge_upsert", "x42_ann_recall",
    "x45_semantic_dedup", "x46_importance_sample", "x47_bigram_lm",
    "x48_diversity_sample", "x49_decayed_counts", "x50_image_features",
    "x52_zorder", "x53_pq_encode", "x54_pq_search", "x55_quantize_int8",
    "x58_dedup_keep_best", "x60_topk_per_group", "x61_langid_eval",
    "x62_truncation_eval", "x63_chunk_roundtrip", "x67_hierarchy_paths",
    "x70_hll_accuracy", "x73_dq_checks", "x76_token_entropy",
    # set-op and curation composites
    "u3_intersect_except", "p3_curate",
]
# Backwards-compat aliases (round-4/5 names); same contract test applies.
_ROUND5_PRIORITY = _ROUND6_PRIORITY
_ROUND4_PRIORITY = _ROUND6_PRIORITY


def _ordered() -> dict[str, tuple[Builder, str | None]]:
    front = {n: REGISTRY[n] for n in _ROUND4_PRIORITY if n in REGISTRY}
    rest_oracled = {n: v for n, v in REGISTRY.items()
                    if n not in front and v[1] is not None}
    rest_weak = {n: v for n, v in REGISTRY.items()
                 if n not in front and v[1] is None}
    return {**front, **rest_oracled, **rest_weak}


def queries() -> dict[str, Builder]:
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in _ordered().items() if sql is not None}

