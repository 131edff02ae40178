"""Time one registry query in isolation and dump its stage metrics.

Usage: [SPARK_GRAFT_CPUS=32] python tools/qtime.py <query> [reps]

Runs bench.py's protocol (untimed priming rep, then timed reps with
cache eviction between them) for a single query, with the Spark UI
enabled so the REST API can report per-stage wall/shuffle metrics of
the LAST timed rep. Prints a compact table: stage id, name (job
description truncated), task count, wall, shuffle read/write bytes,
input bytes, python eval time when present.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    import bench
    from data_ingest_spark.harness import registry

    # mirror session.get_spark but with the UI on for REST metrics
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.codegen.cache.maxEntries", "4096")
    )
    extra = os.environ.get("QTIME_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, v = kv.split("=", 1)
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    qs = registry.queries()
    fn = qs[name]

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # priming
    run()
    bench._evict_all(spark)
    times = []
    marks = []
    for _ in range(reps):
        t_begin = time.time() * 1000
        times.append(run())
        marks.append(t_begin)
        spark.catalog.clearCache()
        bench._evict_all(spark)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    # only stages submitted during the LAST timed rep
    last = [s for s in stages
            if s.get("firstTaskLaunchedTime") and _ms(s["submissionTime"]) >= marks[-1]]
    last.sort(key=lambda s: -(s.get("executorRunTime", 0)))
    print(f"\n{name}: reps={['%.2f' % t for t in times]} min={min(times):.2f}s")
    print(f"{'stage':>5} {'tasks':>5} {'runTime_s':>9} {'shRead_MB':>9} "
          f"{'shWrite_MB':>10} {'input_MB':>8}  name")
    for s in last[:18]:
        print(f"{s['stageId']:>5} {s['numCompleteTasks']:>5} "
              f"{s.get('executorRunTime', 0)/1e3:>9.2f} "
              f"{s.get('shuffleReadBytes', 0)/1e6:>9.1f} "
              f"{s.get('shuffleWriteBytes', 0)/1e6:>10.1f} "
              f"{s.get('inputBytes', 0)/1e6:>8.1f}  "
              f"{(s.get('description') or s['name'])[:70]}")
    spark.stop()
    return 0


def _ms(iso: str) -> float:
    # "2026-08-17T10:00:00.123GMT" -> epoch millis
    from datetime import datetime, timezone
    s = iso.replace("GMT", "+0000")
    dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%z")
    return dt.timestamp() * 1000


if __name__ == "__main__":
    raise SystemExit(main())
