"""Run the bench headline at the three driver scale factors and emit
the SCALING.md markdown table.

Usage: python tools/scaling_sweep.py [out.md]

Each SF runs the same protocol as bench.py (min-of-2 steady-state
reps, SQL-cache clear between reps, leaked-RDD eviction + untimed GC
between queries) in its own process-sequential session, so the three
columns are comparable. The 100x ratio column is sf0.1 / sf0.001.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict[str, dict[str, float]] = {}
    for sf in SFS:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}")
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env, capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[sf] = json.loads(line)["queries"]
        print(f"# {sf}: total "
              f"{round(sum(results[sf].values()), 1)} s", file=sys.stderr)

    names = [n for n in results[SFS[0]] if all(n in results[s] for s in SFS)]
    lines = ["| query | sf0.001 | sf0.01 | sf0.1 | x(0.1/0.001) |",
             "|---|---|---|---|---|"]
    tot = {s: 0.0 for s in SFS}
    for n in names:
        a, b, c = (results[s][n] for s in SFS)
        for s, v in zip(SFS, (a, b, c)):
            tot[s] += v
        ratio = c / a if a > 0 else float("nan")
        lines.append(f"| {n} | {a:.2f} | {b:.2f} | {c:.2f} | {ratio:.1f} |")
    a, b, c = (tot[s] for s in SFS)
    lines.append(f"| **total** | **{a:.1f}** | **{b:.1f}** | **{c:.1f}** "
                 f"| **{c / a:.1f}** |")
    text = "\n".join(lines) + "\n"
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(text)
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
