"""Declarative data-quality expectations: the validation pass a
production table runs before publication (null/range/uniqueness/set
membership checks), expressed so the whole rule set costs ONE
aggregation job over the table — not one scan per rule.

``check(df, rules)`` returns one row per rule:
(rule, column, n_violations, n_rows, pass).

Rule forms (dicts):
  {"rule": "not_null",  "column": c}
  {"rule": "unique",    "column": c}               # duplicate rows counted
  {"rule": "in_range",  "column": c, "lo": x, "hi": y}   # inclusive
  {"rule": "in_set",    "column": c, "allowed": [...]}
  {"rule": "matches",   "column": c, "pattern": regex}
  {"rule": "expression","column": label, "expr": sql_bool}  # row passes iff true

Everything except ``unique`` is a conditional count in one pass;
``unique`` needs its own groupBy (a genuine shuffle) and is unioned
in. All counting is integer-exact, so the report is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _violation_expr(rule: dict):
    kind, c = rule["rule"], rule["column"]
    col = F.col(c) if kind != "expression" else None
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        return col.isNull() | (col < rule["lo"]) | (col > rule["hi"])
    if kind == "in_set":
        return col.isNull() | ~col.isin(list(rule["allowed"]))
    if kind == "matches":
        return col.isNull() | ~col.rlike(rule["pattern"])
    if kind == "expression":
        return ~F.expr(rule["expr"])
    raise ValueError(f"unknown rule kind '{kind}'")


def check(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run every rule; single-pass for row-local rules, one extra
    aggregation per ``unique`` rule. Returns
    (rule, column, n_violations, n_rows, pass) sorted-stable."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r["rule"] != "unique"]
    uniq_rules = [r for r in rules if r["rule"] == "unique"]

    parts = []
    if row_rules:
        aggs = [F.count("*").alias("_n")]
        for i, r in enumerate(row_rules):
            # coalesce: SUM over zero rows is NULL, and an empty table
            # must report 0 violations / pass, not NULL
            aggs.append(F.coalesce(
                F.sum(F.when(_violation_expr(r), 1).otherwise(0)),
                F.lit(0)).cast("long").alias(f"_v{i}"))
        one = df.agg(*aggs)
        for i, r in enumerate(row_rules):
            parts.append(one.select(
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.col(f"_v{i}").alias("n_violations"),
                F.col("_n").cast("long").alias("n_rows")))
    for r in uniq_rules:
        c = r["column"]
        dup = (df.groupBy(c).agg(F.count("*").alias("_k"))
               .agg(F.coalesce(F.sum(F.when(F.col("_k") > 1,
                                            F.col("_k"))), F.lit(0))
                    .cast("long").alias("n_violations"),
                    F.coalesce(F.sum("_k"), F.lit(0)).cast("long")
                    .alias("n_rows")))
        parts.append(dup.select(F.lit("unique").alias("rule"),
                                F.lit(c).alias("column"),
                                "n_violations", "n_rows"))
    if not parts:
        return spark.createDataFrame(
            [], "rule string, column string, n_violations long, "
                "n_rows long, pass boolean")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("n_violations") == 0)
