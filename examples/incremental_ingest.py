"""End-to-end INCREMENTAL ingest loop: the 100 TB maintenance story.

A corpus that grows by batches must never pay an O(corpus) rescan per
batch. This example wires the engine's three mergeable-state families
into one documented loop with an exactly-once ledger:

  1. fuzzy-dedup index   (extensions.dedup_index) — new docs are
     MinHash-banded and joined against the STORED band table (archive
     co-located by bucket, never re-shingled); the batch then appends.
  2. IVF ANN index state (extensions.similarity.ivf_assign_state /
     merge_ivf_state) — per-(cell, dim) integer partial sums; merging
     a batch's state is bit-identical to recomputing over the union.
  3. quality rollups     (extensions.cdc.agg_state/merge_agg_state +
     extensions.sketches.equi_width_hist/merge_hists) — DECIMAL /
     integer states, associative by construction.

Exactly-once: every batch carries a caller-assigned ``batch_id``; an
ordered parquet ledger records applied ids, and the ledger append is
the SINGLE COMMIT POINT. Every state mutation before it is staged to
a deterministic batch-keyed location — dedup appends overwrite their
own ``batch=<id>`` subdir, the merged IVF/rollup/hist states are
written to fresh ``asof=<id>`` versions computed from the
last-COMMITTED version — so a crash at ANY point before the ledger
append leaves the committed state untouched, and the orchestrator's
replay recomputes from the same inputs and overwrites the same
staged paths: applied-exactly-once for every crash window, not just
the happy path (same posture as streaming/ingest.py's idempotent
sink). Replay of a committed batch short-circuits to a NO-OP via the
ledger. The property is pinned by tests/test_incremental_example.py,
including the mid-crash replay.

    python examples/incremental_ingest.py [workdir]

Reference lifecycle being mirrored: the reference pipeline is
batch-rebuild-everything (docker-entrypoint.sh runs all 6 stages per
experiment); this is the architecture you need instead when the
"experiment" is a 100 TB corpus receiving daily batches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


# --------------------------------------------------------------- ledger

def _ledger_path(root: str) -> str:
    return os.path.join(root, "ledger")


def _ledger_list(spark: SparkSession, root: str) -> list[str]:
    """Applied batch ids in commit order (the ledger carries a seq)."""
    p = _ledger_path(root)
    if not os.path.exists(p):
        return []
    rows = spark.read.parquet(p).orderBy("seq").collect()
    return [r["batch_id"] for r in rows]


def applied_batches(spark: SparkSession, root: str) -> set[str]:
    return set(_ledger_list(spark, root))


def _record_batch(spark: SparkSession, root: str, batch_id: str,
                  seq: int) -> None:
    """THE commit point: until this append lands, nothing the batch
    staged is reachable from the committed state."""
    (spark.createDataFrame([(seq, batch_id)], "seq long, batch_id string")
     .coalesce(1).write.mode("append").parquet(_ledger_path(root)))


# ------------------------------------------------------ versioned state

def _state_dir(root: str, name: str, tag: str) -> str:
    return os.path.join(root, name, f"asof={tag}")


def read_state(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a state table at its last COMMITTED version."""
    tag = _ledger_list(spark, root)[-1]
    return spark.read.parquet(_state_dir(root, name, tag))


# ------------------------------------------------------------ the loop

def init_state(spark: SparkSession, root: str, docs: DataFrame,
               emb: DataFrame, events: DataFrame, n_cells: int = 4) -> None:
    """Bootstrap all index/state tables from the seed corpus."""
    from data_ingest_spark.extensions.cdc import agg_state
    from data_ingest_spark.extensions.dedup_index import build_dedup_index
    from data_ingest_spark.extensions.similarity import (ivf_assign_state,
                                                         ivf_seed_centroids)
    from data_ingest_spark.extensions.sketches import equi_width_hist

    build_dedup_index(docs, os.path.join(root, "dedup"), tag="seed")
    # Centroids are FROZEN at bootstrap (the IVF contract: cell
    # geometry stays fixed; nightly merges only move the per-cell
    # sums). Re-seeding would invalidate every stored assignment.
    cents = ivf_seed_centroids(emb, k=n_cells)
    cents.write.mode("overwrite").parquet(os.path.join(root, "ivf_centroids"))
    cents2 = spark.read.parquet(os.path.join(root, "ivf_centroids"))
    (ivf_assign_state(emb, cents2)
     .write.mode("overwrite").parquet(_state_dir(root, "ivf_state", "seed")))
    (agg_state(events, ["event_type"])
     .write.mode("overwrite").parquet(_state_dir(root, "rollup", "seed")))
    (equi_width_hist(docs.select(F.length("text")
                                 .cast("double").alias("v")),
                     "v", 0.0, 4000.0, 20)
     .write.mode("overwrite").parquet(_state_dir(root, "hist", "seed")))
    _record_batch(spark, root, "seed", seq=0)


def ingest_batch(spark: SparkSession, root: str, batch_id: str,
                 docs: DataFrame, emb: DataFrame,
                 events: DataFrame) -> DataFrame | None:
    """Apply one batch to every state table; returns the batch's
    near-dup pairs against the archive, or None if ``batch_id`` was
    already applied (replay ⇒ no-op). Each step is O(batch), never
    O(corpus): the archive participates only through co-located
    stored tables and small mergeable states.

    Crash-safe exactly-once: every write below targets a
    deterministic batch-keyed path (``batch=<id>`` dedup subdir,
    ``asof=<id>`` state versions) and READS only last-COMMITTED
    state, so a replay after a crash at any point recomputes the
    identical outputs and overwrites its own partial leftovers; the
    ledger append at the end is the sole commit."""
    from data_ingest_spark.extensions.cdc import agg_state, merge_agg_state
    from data_ingest_spark.extensions.dedup_index import update_dedup_index
    from data_ingest_spark.extensions.similarity import (ivf_assign_state,
                                                         merge_ivf_state)
    from data_ingest_spark.extensions.sketches import (equi_width_hist,
                                                       merge_hists)

    led = _ledger_list(spark, root)
    if batch_id in led:
        return None
    prev = led[-1]

    # 1. fuzzy dedup: batch vs committed archive (own batch=<id>
    #    subdir excluded on replay), staged as an overwrite of that
    #    same subdir
    pairs = update_dedup_index(spark, os.path.join(root, "dedup"), docs,
                               tag=batch_id)

    # 2. IVF state merge (⊕ of integer partials ≡ recompute), staged
    #    as a fresh asof=<batch_id> version
    cents = spark.read.parquet(os.path.join(root, "ivf_centroids"))
    old_ivf = spark.read.parquet(_state_dir(root, "ivf_state", prev))
    (merge_ivf_state(old_ivf, ivf_assign_state(emb, cents))
     .write.mode("overwrite")
     .parquet(_state_dir(root, "ivf_state", batch_id)))

    # 3. rollup + histogram merges, same staging
    old_roll = spark.read.parquet(_state_dir(root, "rollup", prev))
    (merge_agg_state(old_roll, agg_state(events, ["event_type"]),
                     ["event_type"])
     .write.mode("overwrite")
     .parquet(_state_dir(root, "rollup", batch_id)))
    old_hist = spark.read.parquet(_state_dir(root, "hist", prev))
    batch_hist = equi_width_hist(
        docs.select(F.length("text").cast("double").alias("v")),
        "v", 0.0, 4000.0, 20)
    (merge_hists(old_hist, batch_hist)
     .write.mode("overwrite").parquet(_state_dir(root, "hist", batch_id)))

    # 4. COMMIT, then reclaim versions older than the one we merged
    #    from (prev stays for readers that resolved it pre-commit)
    _record_batch(spark, root, batch_id, seq=len(led))
    _gc_states(root, keep={prev, batch_id})
    return pairs


def _gc_states(root: str, keep: set[str]) -> None:
    import shutil
    for name in ("ivf_state", "rollup", "hist"):
        base = os.path.join(root, name)
        for d in os.listdir(base):
            if d.startswith("asof=") and d.split("=", 1)[1] not in keep:
                shutil.rmtree(os.path.join(base, d))


# ------------------------------------------------------------- demo run

def main() -> int:
    import tempfile

    from data_ingest_spark.session import get_spark

    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="incremental_")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("incremental-ingest", cpus=8)

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .select("vec_id", F.transform("embedding",
                                         lambda x: x.cast("double"))
                   .alias("embedding")))
    ev = spark.read.parquet(f"{sf}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":  # TIMESTAMP(NANOS) as long
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = ev.select("event_type",
                   F.col("value").cast("double").alias("value"), "ts")

    seed_docs = docs.filter(F.col("doc_id") % 3 == 0)
    b1_docs = docs.filter(F.col("doc_id") % 3 == 1)
    seed_emb, b1_emb = (emb.filter(F.col("vec_id") % 3 == 0),
                        emb.filter(F.col("vec_id") % 3 == 1))
    seed_ev, b1_ev = (ev.filter(F.dayofmonth("ts") % 2 == 0),
                      ev.filter(F.dayofmonth("ts") % 2 == 1))

    print(f"state root: {root}")
    init_state(spark, root, seed_docs, seed_emb, seed_ev)
    print("seeded:", sorted(applied_batches(spark, root)))

    pairs = ingest_batch(spark, root, "day-1", b1_docs, b1_emb, b1_ev)
    print("day-1 near-dup pairs vs archive:", pairs.count())
    replay = ingest_batch(spark, root, "day-1", b1_docs, b1_emb, b1_ev)
    print("day-1 replay =>", "no-op" if replay is None else "BUG")

    roll = read_state(spark, root, "rollup")
    print("rollup keys:", roll.count(),
          "events:", roll.agg(F.sum("cnt")).collect()[0][0])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
