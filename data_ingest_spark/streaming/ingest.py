"""Composed streaming corpus ingestion: the end-to-end shape a live
training-data pipeline runs — files land continuously, every document
is quality-gated and deduplicated exactly once, and accepted documents
publish atomically to content-addressed batch directories.

Exactly-once contract: Structured Streaming replays a failed
microbatch with the SAME batch id; the sink writes each batch to its
own ``batch=<id>`` directory with mode("overwrite"), so a replay
rewrites the identical directory instead of double-appending — the
standard idempotent-foreachBatch pattern. Dedup state lives in the
engine's state store behind a watermark (bounded memory at any rate).

100 TB posture: the gate is a map-only filter, dedup shuffles on the
content hash (state-store partitioned), and each batch write is one
job — no driver-side accumulation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORPUS_SCHEMA = ("doc_id long, text string, ts timestamp")


def read_corpus_stream(spark: SparkSession, src_path: str) -> DataFrame:
    """JSONL corpus file stream with the declared schema (streaming
    sources cannot infer; malformed lines surface as nulls, dropped by
    the gate)."""
    return (spark.readStream.schema(CORPUS_SCHEMA)
            .option("maxFilesPerTrigger", 16)
            .json(src_path))


def gate_and_dedup(stream: DataFrame, min_tokens: int = 3,
                   watermark: str = "10 minutes") -> DataFrame:
    """Quality gate (token floor, non-null id/text) then native
    streaming dedup on the content hash within the watermark."""
    gated = (stream
             .filter(F.col("doc_id").isNotNull()
                     & F.col("text").isNotNull())
             .filter(F.size(F.split(F.col("text"), r"\s+"))
                     >= min_tokens)
             .withColumn("content_hash",
                         F.md5(F.col("text").cast("binary"))))
    return (gated.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def batch_publisher(dest_path: str):
    """foreachBatch sink: idempotent per-batch directory plus a
    manifest row (n_docs, id_checksum) written to the same directory —
    a replayed batch id rewrites, never appends."""
    def publish(batch_df: DataFrame, batch_id: int) -> None:
        out = f"{dest_path}/batch={batch_id}"
        batch_df.persist()
        try:
            (batch_df.write.mode("overwrite").parquet(out))
            rowh = F.conv(F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")),
                1, 15), 16, 10).cast("long")
            (batch_df.withColumn("_rh", rowh)
             .groupBy()
             .agg(F.count("*").alias("n_docs"),
                  F.expr("bit_xor(_rh)").alias("id_checksum"))
             .withColumn("batch_id", F.lit(batch_id))
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{dest_path}/_manifest/batch={batch_id}"))
        finally:
            batch_df.unpersist()
    return publish


def streaming_corpus_ingest(spark: SparkSession, src_path: str,
                            dest_path: str, checkpoint_path: str,
                            min_tokens: int = 3,
                            watermark: str = "10 minutes"):
    """Wire the full pipeline and return the started query. Callers
    drive it with trigger(availableNow=True) semantics via
    ``q.awaitTermination()`` in tests; production leaves it running."""
    cleaned = gate_and_dedup(read_corpus_stream(spark, src_path),
                             min_tokens, watermark)
    return (cleaned.writeStream
            .foreachBatch(batch_publisher(dest_path))
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())
