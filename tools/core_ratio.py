"""Core-scaling ratio for the heavy tail at a real data size.

Usage: python tools/core_ratio.py [sf_dir] [query ...]

Round-9 verdict ask #7: the sf0.1 8-vs-32-core block proves
scheduler-bound behavior, not parallelism — per-stage work at sf0.1 is
smaller than scheduler overhead, so most ratios sit near 1. This tool
runs the named queries (default: the >=2 s tail the verdict listed) at
sf1 on 8 and on 32 cores, each leg in its OWN subprocess session with
the bench protocol (untimed priming rep, min-of-2 timed reps, stage-dir
eviction between reps), and prints sec@8 / sec@32 per query. Ideal is
4.0; a data-bound query should clear 2.0, a driver-bound one stays ~1.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "x130_ppjoin", "x69_containment", "p3_curate", "m2_doublets_native",
    "m9_integrate_exact", "x125_entity_resolution", "m13_louvain_dist",
]

_LEG = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from data_ingest_spark.harness import registry
from data_ingest_spark.session import get_spark
import bench

sf_dir = {sf_dir!r}
names = {names!r}
spark = get_spark("core-ratio")
qs = registry.queries()
out = {{}}
for name in names:
    try:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        out[name] = {{"err": str(exc)[:200]}}
        continue
    bench._evict_all(spark)
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 2))
        bench._evict_all(spark)
    out[name] = {{"reps": reps, "min": min(reps)}}
spark.stop()
print("CORE_RATIO_JSON:" + json.dumps(out))
"""


def run_leg(cpus: int, sf_dir: str, names: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir)
    code = _LEG.format(repo=REPO, sf_dir=sf_dir, names=names)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True)
    for line in proc.stdout.splitlines():
        if line.startswith("CORE_RATIO_JSON:"):
            return json.loads(line[len("CORE_RATIO_JSON:"):])
    raise SystemExit(f"leg c{cpus} failed:\n{proc.stderr[-2000:]}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "localdata", "sf1")
    names = sys.argv[2:] or DEFAULT_QUERIES
    legs = {}
    for cpus in (32, 8):
        legs[cpus] = run_leg(cpus, sf_dir, names)
        print(f"leg c{cpus} done: "
              + json.dumps(legs[cpus], sort_keys=True), flush=True)
    print(f"\n{'query':28s} {'sec@8':>8s} {'sec@32':>8s} {'ratio':>6s}")
    rows = {}
    for name in names:
        a, b = legs[8].get(name, {}), legs[32].get(name, {})
        if "min" in a and "min" in b:
            ratio = round(a["min"] / max(b["min"], 1e-9), 2)
            rows[name] = {"sec8": a["min"], "sec32": b["min"],
                          "ratio": ratio, "reps8": a["reps"],
                          "reps32": b["reps"]}
            print(f"{name:28s} {a['min']:8.2f} {b['min']:8.2f} {ratio:6.2f}")
        else:
            rows[name] = {"err": a.get("err") or b.get("err")}
            print(f"{name:28s} ERR {rows[name]['err']}")
    label = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(REPO, f"core_ratio_{label}.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
