"""Persistent MinHash-LSH dedup index: the storage lifecycle behind
incremental fuzzy dedup (near_dups_against computes one batch against
an in-memory corpus; at 100 TB the archive side must come from disk).

The index is two parquet tables:

  bands/       (id, band, bucket)  — repartitioned by bucket so each
               day's candidate join shuffles ONLY the new batch; the
               archive side is already co-located by join key.
  membership/  (id, shingle)       — repartitioned by id for the
               verification join's size/intersection lookups.

``update_dedup_index`` appends a new batch and returns the new-vs-
indexed near-dup pairs computed against the STORED tables — the
archive is never re-shingled. Ids must be unique across batches (the
incremental contract callers already hold for dedup_against).

Durability layout (round 6): the live tables resolve through an
optional ``CURRENT`` generation pointer — compaction writes a fresh
``gen-<n>`` and commits with ONE atomic ``os.replace`` of the
pointer, so readers always see a complete generation and a crashed
compaction leaves the live index untouched. With ``tag=`` the append
targets a ``batch=<tag>`` Hive subdir as an idempotent overwrite
(exactly-once replay; see update_dedup_index and
examples/incremental_ingest.py's staged-commit loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingest_spark.extensions.dedup import (jaccard_of_pairs_two_sided,
                                                minhash_bands, shingle_sets)
from data_ingest_spark.functions.partitioning import spread


def _live_root(path: str) -> str:
    """Resolve the index's live generation directory.

    The tables live either directly under ``path`` (initial layout) or
    under ``path/gen-<n>`` once a compaction has run; the ``CURRENT``
    pointer file names the live generation. Committing a compaction is
    ONE atomic ``os.replace`` of that pointer, so a concurrent reader
    always resolves a complete generation and a crashed compaction
    leaves the pointer — and therefore the live index — untouched."""
    import os
    cur = os.path.join(path, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as fh:
            return os.path.join(path, fh.read().strip())
    return path


def build_dedup_index(df: DataFrame, path: str, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      n_files: int = 8, tag: str | None = None) -> None:
    """Create the index from an initial corpus (overwrites).

    With ``tag`` the tables land in ``bands/batch=<tag>/`` Hive
    partition subdirs instead of the table root — the layout that
    makes every later tagged append an idempotent overwrite of its
    own deterministic subdir (exactly-once replay; see
    ``update_dedup_index``). Tag usage must be consistent for the
    life of an index: partition discovery rejects a mix of root
    files and ``batch=`` subdirs."""
    root = _live_root(path)
    sub = f"/batch={tag}" if tag is not None else ""
    membership = shingle_sets(spread(df), id_col, text_col, k).persist()
    bb = minhash_bands(membership, id_col, text_col, k, num_hashes,
                       bands, membership=True)
    (bb.repartition(n_files, "bucket")
     .write.mode("overwrite").parquet(f"{root}/bands{sub}"))
    (membership.repartition(n_files, id_col)
     .write.mode("overwrite").parquet(f"{root}/membership{sub}"))
    membership.unpersist()


def update_dedup_index(spark: SparkSession, path: str, new_docs: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       k: int = 3, num_hashes: int = 12, bands: int = 4,
                       threshold: float = 0.6,
                       n_files: int = 8, tag: str | None = None) -> DataFrame:
    """Append ``new_docs`` to the index and return the
    (id_new, id_old, jaccard) pairs of the batch against everything
    indexed BEFORE this call (>= threshold). The returned frame is
    materialized before the append so its lineage cannot observe the
    index's own update.

    With ``tag`` (an index built tagged) the append is an OVERWRITE
    of the batch's own ``batch=<tag>`` subdir and the archive side
    excludes that subdir — so a crashed-then-replayed batch rewrites
    exactly its own rows and returns the same pairs, never
    duplicating the append or pairing the batch against its own
    half-committed rows. This is the idempotence an exactly-once
    orchestrator ledger commits against (examples/incremental_ingest)."""
    root = _live_root(path)
    stored_bands = spark.read.parquet(f"{root}/bands")
    stored_mem = spark.read.parquet(f"{root}/membership")
    if tag is not None:
        stored_bands = stored_bands.filter(
            F.col("batch") != tag).drop("batch")
        stored_mem = stored_mem.filter(F.col("batch") != tag).drop("batch")

    new_mem = shingle_sets(spread(new_docs), id_col, text_col, k).persist()
    new_bands = minhash_bands(new_mem, id_col, text_col, k, num_hashes,
                              bands, membership=True).persist()

    cand = (new_bands.select("band", "bucket",
                             F.col(id_col).alias("id_a"))
            .join(stored_bands.select("band", "bucket",
                                      F.col(id_col).alias("id_b")),
                  ["band", "bucket"])
            .select("id_a", "id_b").distinct())
    pairs = (jaccard_of_pairs_two_sided(cand, new_mem, stored_mem, id_col)
             .filter(F.col("jaccard") >= threshold)
             .select(F.col("id_a").alias("id_new"),
                     F.col("id_b").alias("id_old"), "jaccard"))
    # Materialize through the index directory (never a driver collect —
    # a big batch can carry many pairs) so the returned frame's lineage
    # reads a frozen snapshot instead of observing the append below.
    pairs.write.mode("overwrite").parquet(f"{path}/_last_pairs")
    result = spark.read.parquet(f"{path}/_last_pairs")

    sub = f"/batch={tag}" if tag is not None else ""
    mode = "overwrite" if tag is not None else "append"
    (new_bands.repartition(n_files, "bucket")
     .write.mode(mode).parquet(f"{root}/bands{sub}"))
    (new_mem.repartition(n_files, id_col)
     .write.mode(mode).parquet(f"{root}/membership{sub}"))
    new_mem.unpersist()
    new_bands.unpersist()
    return result


def compact_dedup_index(spark: SparkSession, path: str,
                        n_files: int = 8) -> dict:
    """Rewrite the index's two tables into ``n_files`` files each,
    preserving the join-key layout (bands by bucket, membership by
    id). Daily appends leave one small file set per batch; after N
    batches the candidate join opens N× the files it needs — the
    classic small-files tax. Compaction is the nightly maintenance
    job: read the live generation, repartition BOTH tables on the SAME
    keys into a fresh ``gen-<n>`` directory, then commit by atomically
    replacing the ``CURRENT`` pointer file (one ``os.replace``). The
    live tables are never touched in place: a reader that resolves
    ``CURRENT`` before the commit reads the complete old generation, a
    reader after it reads the complete new one, and a crash at ANY
    point before the pointer flip leaves the live index untouched
    (the half-written ``gen-<n>`` is unreferenced garbage the next
    compaction reclaims). The superseded generation is retained until
    the NEXT compaction commits, so an in-flight reader holding the
    old root keeps its files.

    Returns {'bands': n_rows, 'membership': n_rows} for the audit
    log."""
    import os
    import shutil

    root = _live_root(path)
    gens = sorted(int(d.split("-", 1)[1]) for d in os.listdir(path)
                  if d.startswith("gen-") and d.split("-", 1)[1].isdigit())
    new_gen = (gens[-1] + 1) if gens else 1
    nxt_root = os.path.join(path, f"gen-{new_gen}")

    counts = {}
    for name, key in (("bands", "bucket"), ("membership", None)):
        df = spark.read.parquet(f"{root}/{name}")
        # A tagged (batch=<id>) index compacts all batches into one
        # synthetic batch subdir so the layout stays uniform for
        # future tagged appends.
        tagged = "batch" in df.columns
        dest = (f"{nxt_root}/{name}/batch=__compact{new_gen}"
                if tagged else f"{nxt_root}/{name}")
        if tagged:
            df = df.drop("batch")
        # membership partitions by its id column (whatever the index
        # was built with); bands always by the LSH bucket.
        key_col = key if key is not None else \
            [c for c in df.columns if c != "shingle"][0]
        (df.repartition(n_files, key_col)
         .write.mode("overwrite").parquet(dest))
        counts[name] = spark.read.parquet(dest).count()

    # Single atomic commit: CURRENT now names the new generation.
    tmp = os.path.join(path, "CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"gen-{new_gen}")
    os.replace(tmp, os.path.join(path, "CURRENT"))

    # Reclaim everything older than the generation we just superseded:
    # keep gen-<new>, keep the immediately-previous root for in-flight
    # readers, delete earlier gens (and the legacy root tables once a
    # newer generation supersedes them).
    keep = {os.path.basename(root), f"gen-{new_gen}"}
    for d in os.listdir(path):
        if d.startswith("gen-") and d not in keep:
            shutil.rmtree(os.path.join(path, d))
    if root == path and gens:
        pass  # legacy root was live; its tables stay as the retained gen
    elif root != path:
        for name in ("bands", "membership"):
            legacy = os.path.join(path, name)
            if os.path.exists(legacy):
                shutil.rmtree(legacy)
    return counts
