"""Streaming near-duplicate ingestion: a Structured Streaming sink
that gates every micro-batch against the PERSISTENT MinHash-LSH dedup
index (extensions.dedup_index) and appends only novel documents to the
curated corpus.

This is the streaming twin of examples/incremental_ingest.py's daily
batch loop: the same banded index, the same tagged-batch idempotence,
driven by foreachBatch instead of an orchestrator.

EXACTLY-ONCE CONTRACT (shared with the batch loop — one recovery
story, two commit mechanisms):

  - Structured Streaming's checkpoint guarantees each epoch is
    DELIVERED at-least-once with a stable epoch_id; the checkpoint
    advance is this path's COMMIT POINT, playing exactly the role
    the parquet ledger append plays in the batch loop.
  - every write this sink performs is an OVERWRITE of the epoch's own
    deterministic subdir (``batch=e<epoch>`` for the index tables via
    update_dedup_index's tag, and for the curated/pairs outputs here),
    so a replayed epoch rewrites exactly its own rows — at-least-once
    delivery × idempotent writes = exactly-once state.

Crash-window walk (what happens when an epoch HALF-writes — e.g.
curated/batch=e<N> landed but pairs/batch=e<N> did not): the
checkpoint has not advanced, so Structured Streaming redelivers the
epoch with the SAME epoch_id; update_dedup_index's archive side
EXCLUDES the epoch's own ``batch=e<N>`` subdir (dedup_index.py), so
the replay computes the identical pairs from the identical committed
archive, then mode("overwrite") replaces the half-written curated
subdir and writes the missing pairs subdir. Epoch-0 corner: a crash
after build_dedup_index but before the curated write makes the
replay take the UPDATE path (the index now exists) against an
archive that excludes batch=e0 — i.e. an empty archive — yielding no
pairs and every doc kept, the same final state as the uncrashed
seed. Both windows are pinned by
tests/test_streaming_stateful.py::test_neardup_ingest_mid_epoch_crash_replay.

100 TB posture: per micro-batch work is the incremental-dedup shape —
the batch side is shingled once, the archive side is read pre-bucketed
from parquet (bands co-located by bucket), and the candidate join
shuffles ONLY the new batch. Nothing in the loop grows with the
archive except the bucket-join's archive-side scan, which partition
prunes on the joined buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from data_ingest_spark.extensions.dedup_index import (_live_root,
                                                      build_dedup_index,
                                                      update_dedup_index)


def neardup_ingest_batch(index_path: str, curated_path: str,
                         pairs_path: str, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3,
                         threshold: float = 0.6):
    """Return the ``foreachBatch`` function for a near-dup-gated
    ingest stream. Per epoch: seed the index if absent (first epoch),
    else compute the batch's near-dup pairs against everything
    indexed before it; quarantine the matched new docs (write the
    pairs) and append only the novel ones to the curated corpus.
    Every write targets the epoch's own ``batch=e<epoch>`` subdir as
    an overwrite — replaying an epoch is a no-op (see module
    docstring)."""

    def _ingest(bdf: DataFrame, epoch_id: int) -> None:
        tag = f"e{epoch_id}"
        spark = bdf.sparkSession
        docs = bdf.select(id_col, text_col)
        root = _live_root(index_path)
        if not os.path.exists(f"{root}/bands"):
            build_dedup_index(docs, index_path, id_col, text_col,
                              k=k, tag=tag)
            kept = docs
            # The empty first-epoch pairs frame must carry the SAME
            # id types later epochs write (string doc ids would
            # otherwise leave a long-typed epoch-0 file under
            # pairs_path that breaks schema merge on read).
            from pyspark.sql import types as T
            id_type = docs.schema[id_col].dataType
            pairs = spark.createDataFrame([], T.StructType([
                T.StructField("id_new", id_type),
                T.StructField("id_old", id_type),
                T.StructField("jaccard", T.DoubleType())]))
        else:
            pairs = update_dedup_index(spark, index_path, docs,
                                       id_col, text_col, k=k,
                                       threshold=threshold, tag=tag)
            dup_ids = pairs.select(
                F.col("id_new").alias(id_col)).distinct()
            kept = docs.join(dup_ids, id_col, "left_anti")
        (kept.write.mode("overwrite")
         .parquet(f"{curated_path}/batch={tag}"))
        (pairs.write.mode("overwrite")
         .parquet(f"{pairs_path}/batch={tag}"))

    return _ingest


def start_neardup_ingest(stream_docs: DataFrame, index_path: str,
                         curated_path: str, pairs_path: str,
                         checkpoint: str, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 3,
                         threshold: float = 0.6, available_now: bool = True):
    """Wire the gate to a streaming DataFrame and start it."""
    fn = neardup_ingest_batch(index_path, curated_path, pairs_path,
                              id_col, text_col, k, threshold)
    writer = (stream_docs.writeStream.foreachBatch(fn)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
