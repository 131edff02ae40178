"""Event-time windowed aggregations over a streaming events source.

Batch/stream parity: the same logical aggregations exist as batch
queries in harness.registry (e1/e2/e3) with DuckDB oracles; here they
run under `readStream` with watermarks. The tests assert
stream-vs-batch result equality via an availableNow pass into a memory
sink — the standard way to validate a streaming plan offline.

State-size posture at scale: every aggregation is keyed by
(window, event_type) or (session, user) with a watermark, so state is
bounded by watermark horizon × key cardinality; no unbounded state, no
sort on the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

#: Schema when the source parquet stores TIMESTAMP(NANOS) and the
#: session reads nanos as long (see session.get_spark).
EVENT_SCHEMA_NANOS = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       glob: str = "events.parquet") -> DataFrame:
    """Parquet file-stream over the events table, normalized to a
    microsecond `ts` timestamp. File streams need a declared schema,
    and the harness has shipped the column both as TIMESTAMP(NANOS)
    (read as long under the nanosAsLong flag) and as a plain
    microsecond timestamp — so probe the footer with a batch read
    (driver-side, metadata only) and adapt."""
    try:
        batch = spark.read.option("pathGlobFilter", glob).parquet(path)
        ts_type = dict(batch.dtypes)["ts"]
        schema = batch.schema
    except Exception:
        # Start-before-data: the directory is empty (or has no
        # matching files) when the stream is defined — a normal
        # streaming pattern. Fall back to the declared nanos schema
        # (what the harness ships) instead of propagating the
        # 'unable to infer schema' AnalysisException.
        ts_type, schema = "bigint", EVENT_SCHEMA_NANOS
    if ts_type == "bigint":
        ev = (spark.readStream.schema(EVENT_SCHEMA_NANOS)
              .option("pathGlobFilter", glob).parquet(path))
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = (spark.readStream.schema(schema)
          .option("pathGlobFilter", glob).parquet(path))
    # Watermarks demand TIMESTAMP (with local zone); NTZ reinterprets
    # as the same UTC instant under the pinned session timezone.
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-(window, event_type) count and value sum; late data beyond
    `watermark` is dropped and its state evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (gap-based); watermark bounds open
    sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n",
                "total_value")
    )


def run_available_now(df: DataFrame, query_name: str,
                      timeout_sec: int = 120) -> DataFrame:
    """Drain the stream with an availableNow trigger into a memory sink
    (complete mode) and return the result as a batch DataFrame. Offline
    validation helper — production sinks write Parquet/Kafka instead."""
    q = (df.writeStream.format("memory").queryName(query_name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(timeout_sec)
    return df.sparkSession.table(query_name)
