"""Snapshot change-data-capture for corpus versioning.

``snapshot_diff`` classifies every document id across two corpus
snapshots as added / removed / changed (content hash moved), the audit
primitive behind incremental training-data releases: the `changed` +
`added` set is exactly what downstream dedup/tokenize stages must
reprocess, and `removed` drives tombstoning.

Plan shape: each side reduces to (id, content_hash) — 48 bytes a row —
before a single full-outer shuffle join on id. Hashing happens at scan
(codegen md5, no UDF); at 100 TB both sides bucket-write by id so the
daily diff is a co-located join with no shuffle at all
(functions/partitioning.write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  include_unchanged: bool = False) -> DataFrame:
    """(id, change) across snapshots; change ∈ added|removed|changed
    (|unchanged when requested)."""
    h = F.md5(F.col(text_col).cast("binary"))
    o = old.select(F.col(id_col).alias("_id"), h.alias("_ho"))
    n = new.select(F.col(id_col).alias("_id"), h.alias("_hn"))
    j = o.join(n, "_id", "full_outer")
    change = (F.when(F.col("_ho").isNull(), "added")
              .when(F.col("_hn").isNull(), "removed")
              .when(F.col("_ho") != F.col("_hn"), "changed")
              .otherwise("unchanged"))
    out = j.select(F.col("_id").alias(id_col), change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """MERGE semantics without a table format: source rows replace
    matching target rows (matched ⇒ UPDATE), unmatched source rows
    append (⇒ INSERT), untouched target rows pass through. Both sides
    must share a schema.

    Plan shape: one full-outer-shaped pass expressed as target
    anti-join source (one shuffle on the key) unioned with source —
    cheaper than a true full-outer + per-column coalesce since whole
    rows win, not per-column merges. At 100 TB both sides bucketed by
    key make the anti-join co-located; the result is the new snapshot
    to write back (pair with snapshot_diff for the audit trail)."""
    if target.columns != source.columns:
        raise ValueError("merge_upsert requires identical schemas: "
                         f"{target.columns} vs {source.columns}")
    return target.join(source.select(*key_cols), key_cols,
                       "left_anti").unionByName(source)


def scd2_history(events: DataFrame, key_col: str = "user_id",
                 attr_col: str = "event_type", ts_col: str = "ts",
                 tie_col: str = "event_id") -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each key's
    attribute stream into validity intervals. Returns
    ``(key, attr, valid_from, valid_to, n_events)`` where ``valid_to``
    is the next interval's start (NULL = current). Consecutive equal
    values merge into one interval (gaps-and-islands via a
    change-flag running sum); ordering ties break on ``tie_col`` so
    the history is deterministic.

    Plan shape: one shuffle on the key, then two window passes and a
    groupBy — all partitioned by key, so the work parallelizes across
    keys and no single task ever sees more than one key's stream. At
    100 TB the key-partitioned shuffle is the only data movement, and
    a bucketed-by-key event log would eliminate it entirely."""
    from pyspark.sql import Window as W
    w = W.partitionBy(key_col).orderBy(ts_col, tie_col)
    chg = F.when(
        F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col)), 0).otherwise(1)
    isl = (events.select(key_col, attr_col, ts_col, tie_col)
           .withColumn("_chg", chg)
           .withColumn("_island", F.sum("_chg").over(
               w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    # attr goes into the GROUPING KEY, not an aggregate: every row in
    # an island carries the same attr by construction, so the groups
    # are identical — but first(attr)/min(attr) over a string needs a
    # variable-width buffer, which disqualifies HashAggregate and
    # forced a SortAggregate pair with two extra full sorts of the
    # event stream (measured 1.9x at sf0.1). String grouping KEYS
    # hash fine; min(ts)+count are fixed-width buffers.
    runs = (isl.groupBy(key_col, "_island", attr_col)
            .agg(F.min(ts_col).alias("valid_from"),
                 F.count("*").cast("long").alias("n_events")))
    # Chain intervals by the ISLAND index, not valid_from alone: two
    # islands can share a start timestamp (same-instant attribute
    # flips, resolved by tie_col upstream), and ordering only on
    # valid_from would make the valid_to chain nondeterministic there
    # (hypothesis-found: [(a,t0),(b,t0),(a,t0)]). _island is the
    # per-key event sequence by construction.
    w2 = W.partitionBy(key_col).orderBy("valid_from", "_island")
    return (runs.select(key_col, attr_col, "valid_from",
                        F.lead("valid_from").over(w2).alias("valid_to"),
                        "n_events"))


def agg_state(df: DataFrame, keys: list[str], value_col: str = "value",
              ts_col: str = "ts") -> DataFrame:
    """Mergeable per-key aggregate state: (cnt, sum_value, min_ts,
    max_ts). The sum accumulates as DECIMAL(18,6) so it is exact and
    associative — partial states merged in any order (or any partition
    layout) produce bit-identical results, the property incremental
    materialized-view maintenance depends on."""
    dec = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(*keys).agg(
        F.count("*").alias("cnt"),
        F.sum(dec).alias("sum_value"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"))


def merge_agg_state(state: DataFrame, delta: DataFrame,
                    keys: list[str]) -> DataFrame:
    """Incremental rollup maintenance: merge a batch's aggregate state
    into the standing state WITHOUT rescanning history — union the two
    small state tables and re-reduce. count/sum/min/max are all
    mergeable, so merged state ≡ a full recompute over history∪batch
    (the registry oracle asserts exactly that equivalence).

    At 100 TB this is the difference between an O(batch) nightly
    refresh and an O(corpus) rescan: the shuffle carries one row per
    (key × side). Bucket-write the state by key and even that shuffle
    disappears."""
    return (state.unionByName(delta)
            .groupBy(*keys)
            .agg(F.sum("cnt").cast("long").alias("cnt"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_ts").alias("min_ts"),
                 F.max("max_ts").alias("max_ts")))


def merge_intervals(df: DataFrame, key_col: str = "doc_id",
                    start_col: str = "start",
                    end_col: str = "end") -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key into
    maximal disjoint spans — the span-union primitive behind PII-span
    consolidation, match-region blacklists, and validity-window
    compaction. Intervals touch when next.start <= running max(end);
    output is ``(key, span_start, span_end, n_merged)`` per island.

    Plan: the e13/SCD2 island idiom — per-key window ordered by
    (start, end), running MAX(end) over preceding rows marks island
    breaks, a running SUM of breaks numbers the islands, then ONE
    groupBy(key, island) collapses them. Both windows partition by
    key (parallel across keys, no global sort); two shuffles total
    (key window + the groupBy reuses the same key prefix)."""
    from pyspark.sql import Window as W
    w = (W.partitionBy(key_col).orderBy(start_col, end_col)
         .rowsBetween(W.unboundedPreceding, -1))
    prev_max = F.max(end_col).over(w)
    brk = F.when(prev_max.isNull()
                 | (F.col(start_col) > prev_max), 1).otherwise(0)
    wrun = (W.partitionBy(key_col).orderBy(start_col, end_col)
            .rowsBetween(W.unboundedPreceding, 0))
    island = F.sum(brk).over(wrun)
    return (df.withColumn("_isl", island)
            .groupBy(key_col, "_isl")
            .agg(F.min(start_col).alias("span_start"),
                 F.max(end_col).alias("span_end"),
                 F.count("*").cast("long").alias("n_merged"))
            .drop("_isl"))
