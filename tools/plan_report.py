"""Print a physical-plan audit line per registry query.

Usage: python tools/plan_report.py [sf_dir] [query ...]

Columns: shuffles / broadcast joins / per-scan column counts /
pushed filters — the properties that determine 100 TB behavior.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from data_ingest_spark.harness import registry
    from data_ingest_spark.plans import plan_report
    from data_ingest_spark.session import get_spark

    spark = get_spark("plan-report", cpus=8)
    for name, (fn, _) in sorted(registry.REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            rep = plan_report(fn(spark, sf))
        except Exception as exc:  # driver-side ops may need real input
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
            continue
        scans = ",".join(str(n) for n in rep["scans"]) or "-"
        pushed = "; ".join(p for p in rep["pushed_filters"] if p) or "-"
        print(f"{name:28s} shuffles={rep['shuffles']:<2d} "
              f"bcast={rep['broadcast_joins']:<2d} scan_cols=[{scans}] "
              f"pushed=[{pushed}]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
