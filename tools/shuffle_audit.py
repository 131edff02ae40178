"""Runtime shuffle-linearity audit: MEASURED shuffle-write bytes per
query at two scale factors.

The static plan audit (tools/plan_report.py) proves the SHAPE is right
(counts of exchanges, broadcasts, pushdown); this tool proves the
VOLUME is right: for a plan that survives a 100 TB scale-up, the bytes
crossing the wire must grow linearly (or sub-linearly, for
bounded-state aggregations) with the input. A query whose shuffle
grows super-linearly — a hidden semi-cartesian, an exploding join —
shows up here as a ratio far above the input growth even when the
small-SF wall-clock looks fine.

Per query: run once with the no-op sink, then sum the shuffle-write /
input-read bytes of the stages that executed, via the driver's
AppStatusStore (the same numbers the Spark UI shows).

Usage: python tools/shuffle_audit.py [sf_a sf_b] [query ...]
Prints one line per query: name, input MB and shuffle MB at each SF,
and the shuffle growth ratio vs the input growth ratio.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _stage_totals(spark) -> tuple[int, int]:
    """(input bytes, shuffle write bytes) summed over all completed
    stages so far, from the driver's status store."""
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = spark.sparkContext._jvm.java.util.ArrayList()
    # Spark 4 signature: stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus) — pass the Scala defaults.
    d = [store.__getattr__(f"stageList$default${i}")() for i in (2, 3, 4, 5)]
    stages = store.stageList(empty, *d)
    inp = shw = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        inp += s.inputBytes()
        shw += s.shuffleWriteBytes()
    return inp, shw


def measure(spark, fn, sf_dir: str) -> tuple[int, int]:
    i0, s0 = _stage_totals(spark)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    i1, s1 = _stage_totals(spark)
    return i1 - i0, s1 - s0


DEFAULT_QUERIES = [
    "a1_a2_cell_counts", "m1_empty_drops", "m5_log_normalize",
    "m7_scale_data", "x1_exact_dedup", "x2_minhash_lsh_pairs",
    "x5_ann_topk", "x7_text_quality", "m12_knn_exact", "m12_snn_graph",
    "v2_tpch_q1", "v4_tpch_q5", "x34_decontam", "p3_curate",
    "x64_substring_dedup", "x74_ppl_buckets", "p4_training_prep",
    "x80_mix_quota", "e26_incremental_rollup", "x84_bpe_encode",
    "x96_ks_drift", "x99_power_pc1", "x51_kmeans_ivf",
    "m13_louvain_dist", "m9_integrate_exact", "p1_qc_pipeline",
]


def main() -> int:
    args = sys.argv[1:]
    if len(args) >= 2 and "/" in args[0]:
        sf_a, sf_b, names = args[0], args[1], args[2:]
    else:
        sf_a, sf_b = "/root/testdata/sf0.01", "/root/testdata/sf0.1"
        names = args
    names = names or DEFAULT_QUERIES

    from data_ingest_spark.harness import registry
    from data_ingest_spark.session import get_spark

    spark = get_spark("shuffle-audit")
    qs = registry.queries()
    mb = 1024.0 * 1024.0
    print(f"{'query':28s} {'in_a':>8s} {'sh_a':>8s} {'in_b':>8s} "
          f"{'sh_b':>8s} {'in_x':>5s} {'sh_x':>5s}")
    for name in names:
        if name not in qs:
            continue
        ia, sa = measure(spark, qs[name], sf_a)
        ib, sb = measure(spark, qs[name], sf_b)
        in_x = ib / ia if ia else float("nan")
        sh_x = sb / sa if sa else (0.0 if sb == 0 else float("inf"))
        print(f"{name:28s} {ia / mb:8.2f} {sa / mb:8.2f} {ib / mb:8.2f} "
              f"{sb / mb:8.2f} {in_x:5.1f} {sh_x:5.1f}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
