"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle side by side
at the given scale factor, compares row count, sorted column names, and
order-insensitive values (exact string canonicalization after the
registry's own rounding). Exits nonzero on any mismatch.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values to strings, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(round(float(v), 9)))
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(bool(v)))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        else:
            df[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v))
                          else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from data_ingest_spark.harness import registry
    from data_ingest_spark.session import get_spark

    spark = get_spark("verify-local", cpus=16)

    # PHASE 1: every Spark query first, THEN every DuckDB oracle.
    # Interleaving them deadlocks eventually: DuckDB's worker-thread
    # pool persists on the connection after the first oracle, and a
    # pyspark daemon worker forked while a pool thread holds a lock
    # inherits that held lock — the worker wedges, the executor waits
    # on its socket forever, and the driver waits on the executor
    # (observed at sf0.1 after ~100 queries). With the split, all
    # forks happen before DuckDB spins a single thread.
    # Spill each result to a pickle immediately (keeping ~200 full
    # pandas frames resident would exhaust driver memory at sf0.1 for
    # corpus-sized outputs like x84's per-doc token strings); phase 2
    # reloads one at a time and drops it after comparison.
    spill = tempfile.mkdtemp(prefix="verify_spill_")
    spark_res: dict[str, object] = {}
    failures, passed, weak = [], 0, 0
    for name, (fn, sql) in registry.REGISTRY.items():
        if only and name not in only:
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
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    for name, (fn, sql) in registry.REGISTRY.items():
        if only and name not in only:
            continue
        sdf = spark_res[name]
        if isinstance(sdf, Exception):
            failures.append((name, f"spark error: {sdf}"))
            print(f"FAIL {name}: spark error: {sdf}", flush=True)
            continue
        sdf = pd.read_pickle(sdf)
        if sql is None:
            ok = len(sdf) >= 0
            weak += 1
            print(f"weak {name}: rows={len(sdf)} (no oracle)", flush=True)
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}", flush=True)
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        odf.columns = [c for c in odf.columns]
        a, b = canon(sdf), canon(odf.rename(columns=dict(
            zip(sorted(odf.columns, key=str.lower), sorted(sdf.columns, key=str.lower)))))
        if a.equals(b):
            passed += 1
            print(f"PASS {name}: rows={len(a)}", flush=True)
        else:
            neq = (a != b)
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1)
            sample_a = a[idx].head(3).to_dict("records")
            sample_b = b[idx].head(3).to_dict("records")
            failures.append((name, f"values differ in {bad_cols}"))
            print(f"FAIL {name}: values differ in {bad_cols}\n  spark: {sample_a}\n  duck : {sample_b}")

    print(f"\n{passed} passed, {weak} weak (no oracle), {len(failures)} failed",
          flush=True)
    import shutil
    shutil.rmtree(spill, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
