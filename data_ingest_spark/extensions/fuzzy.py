"""Fuzzy (edit-distance) joins via deletion-neighborhood blocking.

Entity resolution across dirty keys — the "same part number, one typo"
join — cannot be a cross join at scale. For edit distance ≤ 1 the
classic blocking identity holds: two strings A, B are within one
insert/delete/substitute iff their key sets K(s) = {s} ∪ {s with one
character deleted} intersect. So each row expands to ``len(s)+1``
blocking keys (linear, data-local), candidates meet in an equi-join on
the key, and the exact ``levenshtein`` check verifies survivors —
shuffle volume is O(total characters), never O(n²).

The expansion uses built-in higher-order functions (transform over a
sequence) — interpreted, but O(len) per row on the scan side, not in
any join loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _deletion_keys(col: F.Column) -> F.Column:
    """array: the string itself plus every single-char deletion."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(col.substr(F.lit(1), i - 1),
                           col.substr(i + 1, F.length(col))))
    return F.array_union(F.array(col), dels)


def fuzzy_join(left: DataFrame, right: DataFrame, col: str,
               max_dist: int = 1, suffix: str = "_r") -> DataFrame:
    """Inner-join rows whose ``col`` values are within levenshtein
    ``max_dist`` (currently 1; the blocking identity is specific to
    distance 1). Right columns come back suffixed."""
    if max_dist != 1:
        raise NotImplementedError("deletion blocking covers max_dist=1")
    lk = (left.withColumn("_k", F.explode(_deletion_keys(F.col(col)))))
    ren = {c: c + suffix for c in right.columns}
    rk = (right.select([F.col(c).alias(ren[c]) for c in right.columns])
          .withColumn("_k",
                      F.explode(_deletion_keys(F.col(ren[col])))))
    cand = (lk.join(rk, "_k")
            .drop("_k")
            .distinct())
    return cand.filter(
        F.levenshtein(F.col(col), F.col(ren[col])) <= max_dist)
