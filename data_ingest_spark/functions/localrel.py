"""Arrow-backed local relations for small driver-built tables.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes even a
handful of rows into ``defaultParallelism`` pickled slices, and every
action over the result (including building a broadcast of it) pays one
Python-worker round-trip per slice — measured ~4.5 s of executor time
per noop save of an 8-row table on local[32]. Feeding pandas instead
routes through the Arrow conversion: the rows ship to the JVM once at
build time and the plan is a ``LocalTableScan`` that never touches
Python again (~0.08 s for the same table).

Use for every small, driver-materialized table that enters a query
plan (threshold tables, probe lists, merge tables, 1-row summaries).
Not for big data — local relations live in the driver and in every
broadcast; the ceiling-guard discipline in ``operators.guards``
applies to anything data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def arrow_local_df(spark: SparkSession, rows: list, schema: str,
                   columns: list[str]) -> DataFrame:
    """``createDataFrame`` through the Arrow/pandas path: ``rows`` is
    a list of tuples, ``schema`` the DDL string (always applied, so
    empty inputs type correctly), ``columns`` the tuple field names in
    order. Values must be Arrow-convertible (ints, floats, strings,
    lists thereof)."""
    import pandas as pd

    # The whole point of this helper is the Arrow conversion path; if
    # the session has Arrow off the createDataFrame below silently
    # degrades to the pickled-RDD path (Scan ExistingRDD) the helper
    # exists to avoid. Fail loudly instead of quietly regressing.
    if str(spark.conf.get("spark.sql.execution.arrow.pyspark.enabled",
                          "false")).lower() != "true":
        raise RuntimeError(
            "arrow_local_df requires "
            "spark.sql.execution.arrow.pyspark.enabled=true (the "
            "session builder in data_ingest_spark.session sets it); "
            "without it every action pays one Python round-trip per "
            "slice of this local relation.")
    pdf = pd.DataFrame(rows, columns=columns)
    return spark.createDataFrame(pdf, schema=schema)
