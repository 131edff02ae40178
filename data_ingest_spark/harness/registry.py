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
from data_ingest_spark.harness import q_round7   # noqa: E402,F401

# Driver-sample ordering. The correctness driver checks a bounded
# prefix of ``queries()`` each round; rounds 2-7 verified 297/297
# registry queries with zero red rows (CORRECTNESS_r02-r07). From
# round 8 the prefix is STALENESS-KEYED and self-maintaining
# (round-7 verdict ask #1): ``tools/staleness.py`` statically traces
# each builder's function-level call graph through the package,
# blames each reached function's line span (-M -C, so refactors
# don't reset times), and marks a query stale when its
# implementation — builder, oracle SQL decorator, or any reached
# operator function — was committed AFTER the round boundary of its
# last driver-green CORRECTNESS row. The generated
# ``harness/rotation.py`` fronts the verdict-pinned rewrites, then
# stale queries most-recently-touched-first, then oldest-ledger
# re-confirmation; queries cut by the 50-slot cap re-front
# automatically next round (their ledger only ages). Regenerate
# after any operator rewrite:  python tools/staleness.py --write
from data_ingest_spark.harness.rotation import \
    ROUND8_PRIORITY as _ROUND8_PRIORITY  # noqa: E402

# Backwards-compat aliases (round-4..7 names); same contract test.
_ROUND7_PRIORITY = _ROUND8_PRIORITY
_ROUND6_PRIORITY = _ROUND8_PRIORITY
_ROUND5_PRIORITY = _ROUND8_PRIORITY
_ROUND4_PRIORITY = _ROUND8_PRIORITY


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

