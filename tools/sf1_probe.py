"""Per-query sf1 scale probe (round-7 verdict ask #2).

Runs each bench headline query ONCE at the given fixture dir with a
per-query wall-clock budget, printing a line per query as it
completes — unlike bench.py (3 passes, no per-query progress), this
is built to FIND the query that goes super-linear at 10x sf0.1, not
to produce steady-state numbers. Budget overruns don't kill the
query (Spark jobs aren't interruptible mid-stage from here); they're
flagged in the output for triage.

Usage: python tools/sf1_probe.py <sf_dir> [start_idx] [query ...]
Writes JSON lines to stdout: {"q": name, "sec": t, "rows": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1]
    rest = sys.argv[2:]
    start = int(rest[0]) if rest and rest[0].isdigit() else 0
    only = set(r for r in rest if not r.isdigit())

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import HEADLINE
    from data_ingest_spark.harness import registry
    from data_ingest_spark.session import get_spark

    spark = get_spark("sf1-probe")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    if only:
        names = [n for n in names if n in only]
    for name in names[start:]:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            err = None
        except Exception as e:          # noqa: BLE001 — probe, record
            n, err = -1, f"{type(e).__name__}: {e}"[:200]
        rec = {"q": name, "sec": round(time.time() - t0, 2), "rows": n}
        if err:
            rec["err"] = err
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
