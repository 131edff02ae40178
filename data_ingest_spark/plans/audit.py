"""Physical-plan audit helpers.

The 100 TB contract is a property of the PLAN, not of a small-SF run:
filters must reach the parquet scan (PushedFilters), small dimensions
must broadcast, nothing may degenerate to a cartesian product, and the
shuffle count must match the operator's documented shape. These helpers
parse `df._jdf...explain`-equivalent output so tests can assert those
properties mechanically — the same checks a human would do by reading
`df.explain("formatted")`.

Used by tests/test_plan_audit.py to pin the plan shape of every
headline query; a regression that adds a shuffle or drops a broadcast
fails the suite even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan (post-Catalyst, pre-AQE-reopt)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _simple_plan(df: DataFrame) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.
    AQE may collapse some at runtime; this counts the static plan —
    the upper bound that holds at any scale."""
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)",
                          _simple_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    plan = _simple_plan(df)
    return (plan.count("BroadcastHashJoin")
            + plan.count("BroadcastNestedLoopJoin"))


def codegen_span_count(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (fused JVM loops) in
    the EXECUTED plan. Under AQE the final plan only exists after an
    action, so this collects `df` first (a sink write would execute a
    DIFFERENT QueryExecution and leave this one un-planned). Test-scale
    frames only."""
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", executed)))


def scan_columns(df: DataFrame, table_hint: str = "") -> list[list[str]]:
    """ReadSchema column lists of each parquet scan (column pruning
    evidence): a 2-column projection must not read 16 columns."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert each needle (e.g. 'IsNotNull(l_quantity)',
    'GreaterThan(o_totalprice') appears in some scan's PushedFilters."""
    pushed = " | ".join(pushed_filters(df))
    for needle in needles:
        assert needle in pushed, (
            f"filter {needle!r} not pushed to any scan; pushed: {pushed}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = _simple_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


def plan_report(df: DataFrame) -> dict:
    """One-line summary used by tools/plan_report.py."""
    return {
        "shuffles": shuffle_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "codegen_spans": codegen_span_count(df),
        "scans": [len(c) for c in scan_columns(df)],
        "pushed_filters": pushed_filters(df),
    }
