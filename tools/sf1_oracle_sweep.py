"""Full-registry value-oracle sweep at sf1 (the 1000x-local fixture).

Same comparison as tools/verify_local.py (row count, schema,
canonicalized values) but built to survive sf1's oracle-side cost
cliff: a handful of DuckDB oracles embed an embeddings self cross
join (~20k x 20k = 400M rows x list_dot_product at sf1), which is a
fixture-size artifact of the ORACLE, not the engine — the Spark side
of those queries is bucketed/banded and runs fine. Those get:

  - a hard EXCLUDE list (the kNN-edge family whose oracles are known
    400M-row cross joins; they keep their value-exact gate at
    sf0.01/sf0.1 and a rows-level probe at sf1), and
  - a per-oracle wall timeout for everything else: the oracle runs in
    a worker thread and `duckdb.interrupt()` fires at the deadline,
    recording TIMEOUT instead of wedging the sweep.

Emits one JSON line {passed, failed, timeout, excluded, weak,
per_query} and writes tools/../localdata/sf1_oracle_sweep.json.

Usage: python tools/sf1_oracle_sweep.py [sf_dir] [--timeout SECS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.verify_local import TABLES, canon  # noqa: E402

# Oracles that are a full embeddings self cross join at sf1 (~400M
# rows x list_dot_product in DuckDB). The ENGINE side is
# banded/bucketed and covered by the rows-level sf1 probe
# (SCALING.md); the value oracle for these stays at sf0.01/sf0.1.
EXCLUDE = [
    "m12_knn_exact", "m12_snn_graph", "m13_label_propagation",
    "m13_louvain_dist", "g1_pagerank", "g2_triangles", "g3_bfs_hops",
    "g4_clustering_coeff", "g5_assortativity", "x135_mutual_knn",
    "m9_integrate_exact",
]


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str,
               timeout: float) -> pd.DataFrame:
    """Execute with a wall deadline; interrupt + raise on overrun."""
    out: dict[str, object] = {}

    def work() -> None:
        try:
            out["df"] = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            out["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        raise TimeoutError(f"oracle exceeded {timeout:.0f}s")
    if "err" in out:
        raise out["err"]  # type: ignore[misc]
    return out["df"]  # type: ignore[return-value]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else os.path.join(REPO, "localdata", "sf1")
    timeout = 600.0
    for a in sys.argv[1:]:
        if a.startswith("--timeout"):
            timeout = float(a.split("=", 1)[1])

    from data_ingest_spark.harness import registry
    from data_ingest_spark.session import get_spark

    spark = get_spark("sf1-oracle-sweep", cpus=16)

    # Phase split mirrors verify_local: all Spark first (fork-safety
    # vs DuckDB's thread pool), spill results to disk.
    spill = tempfile.mkdtemp(prefix="sf1_sweep_")
    spark_res: dict[str, object] = {}
    for name, (fn, sql) in registry.REGISTRY.items():
        if name in EXCLUDE:
            continue
        try:
            pdf = fn(spark, sf).toPandas()
            path = os.path.join(spill, f"{name}.pkl")
            pdf.to_pickle(path)
            spark_res[name] = path
            del pdf
        except Exception as e:  # noqa: BLE001
            spark_res[name] = e
        print(f"spark {name}: done", flush=True)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={max(os.cpu_count() - 4, 4)}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")

    per: dict[str, str] = {n: "excluded" for n in EXCLUDE}
    passed = failed = timed = weak = 0
    for name, (fn, sql) in registry.REGISTRY.items():
        if name in EXCLUDE:
            continue
        sdf = spark_res[name]
        if isinstance(sdf, Exception):
            per[name] = f"spark error: {sdf}"
            failed += 1
            print(f"FAIL {name}: spark error: {sdf}", flush=True)
            continue
        sdf = pd.read_pickle(sdf)
        if sql is None:
            per[name] = f"weak rows={len(sdf)}"
            weak += 1
            print(f"weak {name}: rows={len(sdf)}", flush=True)
            continue
        try:
            odf = run_oracle(con, sql, timeout)
        except TimeoutError as e:
            per[name] = "timeout"
            timed += 1
            print(f"TIMEOUT {name}: {e}", flush=True)
            continue
        except Exception as e:  # noqa: BLE001
            per[name] = f"duckdb error: {e}"
            failed += 1
            print(f"FAIL {name}: duckdb error: {e}", flush=True)
            continue
        if len(sdf) != len(odf):
            per[name] = f"rows {len(sdf)} vs {len(odf)}"
            failed += 1
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}", flush=True)
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(
                map(str.lower, odf.columns)):
            per[name] = "schema mismatch"
            failed += 1
            print(f"FAIL {name}: schema", flush=True)
            continue
        a = canon(sdf)
        b = canon(odf.rename(columns=dict(
            zip(sorted(odf.columns, key=str.lower),
                sorted(sdf.columns, key=str.lower)))))
        if a.equals(b):
            per[name] = "pass"
            passed += 1
            print(f"PASS {name}: rows={len(a)}", flush=True)
        else:
            per[name] = "value mismatch"
            failed += 1
            print(f"FAIL {name}: values", flush=True)

    summary = {"sf": sf, "passed": passed, "failed": failed,
               "timeout": timed, "weak": weak, "excluded": len(EXCLUDE),
               "per_query": per}
    out = os.path.join(REPO, "localdata", "sf1_oracle_sweep.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_query"}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
