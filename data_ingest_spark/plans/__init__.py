from data_ingest_spark.plans.audit import (assert_no_cartesian,
                                           assert_pushed_filters,
                                           broadcast_join_count,
                                           codegen_span_count, physical_plan,
                                           plan_report, scan_columns,
                                           shuffle_count)

__all__ = ["physical_plan", "shuffle_count", "broadcast_join_count",
           "codegen_span_count", "scan_columns", "assert_pushed_filters",
           "assert_no_cartesian", "plan_report"]
