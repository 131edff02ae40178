"""Structured Streaming surface (SURVEY.md §2.9 — optional extension).

The reference is batch-only; these operators model the driver's
`events` table as an append-only stream with event-time windows and
watermark-bounded state, the Spark-idiomatic shape for continuous
ingest at scale.
"""
