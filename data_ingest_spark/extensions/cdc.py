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
