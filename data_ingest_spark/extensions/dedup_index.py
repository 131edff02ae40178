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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from data_ingest_spark.extensions.dedup import (jaccard_of_pairs_two_sided,
                                                minhash_bands, shingle_sets)
from data_ingest_spark.functions.partitioning import spread


def build_dedup_index(df: DataFrame, path: str, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      n_files: int = 8) -> None:
    """Create the index from an initial corpus (overwrites)."""
    membership = shingle_sets(spread(df), id_col, text_col, k).persist()
    bb = minhash_bands(membership, id_col, text_col, k, num_hashes,
                       bands, membership=True)
    (bb.repartition(n_files, "bucket")
     .write.mode("overwrite").parquet(f"{path}/bands"))
    (membership.repartition(n_files, id_col)
     .write.mode("overwrite").parquet(f"{path}/membership"))
    membership.unpersist()


def update_dedup_index(spark: SparkSession, path: str, new_docs: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       k: int = 3, num_hashes: int = 12, bands: int = 4,
                       threshold: float = 0.6,
                       n_files: int = 8) -> DataFrame:
    """Append ``new_docs`` to the index and return the
    (id_new, id_old, jaccard) pairs of the batch against everything
    indexed BEFORE this call (>= threshold). The returned frame is
    materialized before the append so its lineage cannot observe the
    index's own update."""
    stored_bands = spark.read.parquet(f"{path}/bands")
    stored_mem = spark.read.parquet(f"{path}/membership")

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

    (new_bands.repartition(n_files, "bucket")
     .write.mode("append").parquet(f"{path}/bands"))
    (new_mem.repartition(n_files, id_col)
     .write.mode("append").parquet(f"{path}/membership"))
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
    job: read, repartition on the SAME keys, write to a sibling dir,
    then atomically swap via rename (never overwrite-in-place — a
    reader mid-swap sees either the old or the new generation, and a
    crashed compaction leaves the live index untouched).

    Returns {'bands': n_rows, 'membership': n_rows} for the audit
    log."""
    import os
    import shutil

    counts = {}
    for name, key in (("bands", "bucket"), ("membership", None)):
        live = f"{path}/{name}"
        nxt = f"{path}/{name}__compact"
        old = f"{path}/{name}__old"
        df = spark.read.parquet(live)
        # membership partitions by its id column (whatever the index
        # was built with); bands always by the LSH bucket.
        key_col = key if key is not None else \
            [c for c in df.columns if c != "shingle"][0]
        (df.repartition(n_files, key_col)
         .write.mode("overwrite").parquet(nxt))
        counts[name] = spark.read.parquet(nxt).count()
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(live, old)
        os.rename(nxt, live)
        shutil.rmtree(old)
    return counts
