"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: [PLANS_ROUND=r10] python tools/explain_capture.py <suffix> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each named query (default:
every bench.py HEADLINE query; round defaults to r10). The suffix is
"before"/"after" per the optimization-round evidence contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from data_ingest_spark.harness import registry
    from data_ingest_spark.session import get_spark

    spark = get_spark("explain-capture")
    qs = registry.queries()
    names = only or [n for n in bench.HEADLINE if n in qs]

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLANS_ROUND", "r10"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        # builders that persist/checkpoint leak session state; evict so
        # the next capture sees a clean catalog (mirrors bench.py)
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist()
        except Exception:
            pass
        print(f"captured {name}_{suffix}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
