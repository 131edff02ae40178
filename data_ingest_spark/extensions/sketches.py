"""Cardinality sketches.

``kmv_distinct`` is a k-minimum-values estimator: hash every value to
a uniform 60-bit integer, keep the k smallest distinct hashes, and
estimate ``(k-1) / (h_k / 2^60)`` where ``h_k`` is the k-th smallest.
Standard error ~ 1/sqrt(k-2). Unlike HLL its output is a pure
function of the value set — deterministic integer hashing end to end —
so the driver hash-checks it against the same arithmetic in DuckDB.

Scale posture: the grouped form is one distinct-shuffle plus a per-group
window (groups parallelize; the k-th smallest needs only a rank-k scan
per group). The global form uses ``orderBy(h).limit(k)``, which Spark
executes as TakeOrderedAndProject — per-partition top-k then a k-sized
merge on the driver side of the exchange, never a global sort. At
100 TB you'd persist the per-partition k-minima as the mergeable
sketch state; the merge is again "k smallest of the union".

``hll_distinct`` wraps Spark's native HyperLogLog++ aggregate for the
cases where a 1-2% error is fine and the sketch must be O(1) memory;
its value is engine-specific, so it is property-tested against exact
counts rather than oracle-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

TWO_60 = float(1 << 60)


def _h60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string").cast("binary")),
                              1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Per-group (or global) distinct-count estimate plus the exact
    count for reference: (group..., n_distinct_exact, kmv_estimate).
    Groups with fewer than k distinct values report the exact count
    as the estimate (the sketch is lossless below its capacity)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if group_cols:
        v = df.select(*group_cols, _h60(F.col(col)).alias("_h")).distinct()
        wrk = W.partitionBy(*group_cols).orderBy("_h")
        wall = W.partitionBy(*group_cols)
        r = (v.withColumn("_rk", F.row_number().over(wrk))
             .withColumn("_nd", F.count("*").over(wall)))
        est = F.when(
            F.max("_nd") < F.lit(k), F.max("_nd").cast("double")
        ).otherwise(
            F.lit(float(k - 1))
            / (F.max(F.when(F.col("_rk") == k, F.col("_h"))) / F.lit(TWO_60)))
        return (r.filter(F.col("_rk") <= k)
                .groupBy(*group_cols)
                .agg(F.max("_nd").cast("long").alias("n_distinct_exact"),
                     F.round(est, 6).alias("kmv_estimate")))
    v = df.select(_h60(F.col(col)).alias("_h")).distinct()
    nd = v.count()
    if nd < k:
        est_val = float(nd)
    else:
        hk = v.orderBy("_h").limit(k).agg(F.max("_h")).collect()[0][0]
        est_val = (k - 1) / (hk / TWO_60)
    from data_ingest_spark.functions.localrel import arrow_local_df
    return arrow_local_df(
        df.sparkSession, [(int(nd), round(est_val, 6))],
        "n_distinct_exact long, kmv_estimate double",
        ["n_distinct_exact", "kmv_estimate"])


def hll_distinct(df: DataFrame, col: str,
                 group_cols: list[str] | None = None,
                 rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct estimate (engine-native, O(1) state)."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias("hll_estimate")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


CMS_DEPTH, CMS_WIDTH = 4, 1024


def _cms_pos(col: F.Column, row: int, width: int) -> F.Column:
    """Deterministic bucket for hash row ``row``: md5-prefix integer of
    'row:value' mod width — identical arithmetic in DuckDB."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), col.cast("string"))
              .cast("binary"))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % width


def count_min_build(df: DataFrame, col: str, depth: int = CMS_DEPTH,
                    width: int = CMS_WIDTH) -> DataFrame:
    """Count-Min sketch state: ``(row, pos, cell_count)`` — depth×width
    integer cells summarizing the frequency of every value of ``col``.
    The sketch is MERGEABLE (cell-wise +) and its size is O(depth·width)
    regardless of input — the 100 TB property: shard sketches build
    independently per partition-range and add up exactly.

    One explode-free pass: the input is unioned through ``depth``
    bucket projections (stack), then a single groupBy((row, pos)) with
    map-side combine. Deterministic integer state ⇒ exact oracle."""
    rows = [df.select(F.lit(r).alias("row"),
                      _cms_pos(F.col(col), r, width).alias("pos"))
            for r in range(depth)]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return (allrows.groupBy("row", "pos")
            .agg(F.count("*").alias("cell_count")))


def count_min_estimate(sketch: DataFrame, probes: DataFrame,
                       col: str, depth: int = CMS_DEPTH,
                       width: int = CMS_WIDTH) -> DataFrame:
    """Point-frequency estimates for ``probes[col]``: the minimum over
    the depth cells each probe hashes into (classic CMS upper bound —
    ``est >= true``, overestimates only from collisions). The sketch
    side is tiny (≤ depth·width rows) and broadcasts."""
    out = None
    for r in range(depth):
        joined = (probes
                  .select(F.col(col),
                          F.lit(r).alias("row"),
                          _cms_pos(F.col(col), r, width).alias("pos"))
                  .join(F.broadcast(sketch), ["row", "pos"], "left")
                  .select(col, F.coalesce("cell_count", F.lit(0))
                          .alias("est")))
        out = joined if out is None else out.unionByName(joined)
    return out.groupBy(col).agg(F.min("est").alias("est_count"))


BLOOM_BITS, BLOOM_HASHES = 4096, 3


def bloom_build(df: DataFrame, col: str, bits: int = BLOOM_BITS,
                hashes: int = BLOOM_HASHES) -> DataFrame:
    """Bloom filter state as a DISTINCT set of set-bit positions
    (``pos`` rows, ≤ bits) — the deterministic relational encoding of
    the bitset (md5-derived positions, exact in both engines). Like
    the CMS, the state is mergeable (set union) and O(bits) regardless
    of input size."""
    rows = [df.select(_cms_pos(F.col(col), r, bits).alias("pos"))
            for r in range(hashes)]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.distinct()


def bloom_prune(probe: DataFrame, bloom: DataFrame, col: str,
                bits: int = BLOOM_BITS,
                hashes: int = BLOOM_HASHES) -> DataFrame:
    """Keep probe rows whose key PASSES the filter (all ``hashes``
    positions set) — no false negatives, bounded false positives. The
    bloom side broadcasts (≤ bits rows); the probe side never
    shuffles: this is the classic pre-join pruning that cuts shuffle
    volume before an expensive join at 100 TB."""
    marked = probe
    for r in range(hashes):
        hit = (bloom.select(F.col("pos").alias(f"_p{r}"))
               .withColumn(f"_hit{r}", F.lit(1)))
        marked = (marked
                  .withColumn(f"_p{r}", _cms_pos(F.col(col), r, bits))
                  .join(F.broadcast(hit), f"_p{r}", "left"))
    cond = None
    for r in range(hashes):
        c = F.col(f"_hit{r}").isNotNull()
        cond = c if cond is None else cond & c
    drop = [c for r in range(hashes) for c in (f"_p{r}", f"_hit{r}")]
    return marked.filter(cond).drop(*drop)


def equi_width_hist(df: DataFrame, col: str, lo: float, hi: float,
                    nbins: int = 20) -> DataFrame:
    """Mergeable equi-width histogram: one row per non-empty bin with
    integer counts. bin = clamp(floor((v − lo)/width), 0, nbins−1), so
    out-of-range values land in the edge bins (no silent drops — the
    data-quality contract). width = (hi−lo)/nbins and the floor run on
    IEEE-exact doubles, so the assignment is bit-identical across
    engines. One partial-aggregated shuffle of ≤ nbins rows."""
    width = (hi - lo) / nbins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    b = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b)).cast("long")
    return (df.filter(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count("*").cast("long").alias("n")))


def merge_hists(*hists: DataFrame) -> DataFrame:
    """Merge histogram states by summing bin counts — the property
    that lets each ingest batch (or each of 1000 executors' table
    scans) build its own state and a tiny ≤ nbins-row reduce combine
    them, instead of re-scanning 100 TB per refresh."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bin").agg(F.sum("n").cast("long").alias("n"))


def kmv_timeline(events: DataFrame, ts_col: str = "ts",
                 val_col: str = "user_id", k: int = 64) -> DataFrame:
    """Cumulative distinct-count timeline built by MERGING per-day KMV
    sketches — the incremental-ingest pattern: each day's batch keeps
    only its k smallest value hashes (bounded state, written once),
    and any date's cumulative estimate is recovered by merging the
    daily sketches, never rescanning history. Correctness rides on the
    KMV merge identity — min-k(∪ days) = min-k(∪ per-day min-k) — so
    the merged estimate is value-identical to a from-scratch sketch of
    the full prefix, which is exactly what the oracle computes.

    Day-pair triangle join (day_sketch ≤ target_day) keeps every
    window partitioned; state is |days|·k hashes — for multi-year
    timelines merge hierarchically (week/month partials) with the same
    identity. Groups with fewer than k cumulative distincts report the
    exact count (the sketch is lossless below capacity).

    Returns ``(day, n_exact, kmv_estimate)``.
    """
    day = F.to_date(F.col(ts_col)).alias("_day")
    dh = events.select(day, _h60(F.col(val_col)).alias("_h")).distinct()
    wday = W.partitionBy("_day").orderBy("_h")
    daily = (dh.withColumn("_rk", F.row_number().over(wday))
             .filter(F.col("_rk") <= k).select("_day", "_h"))
    days = dh.select(F.col("_day").alias("_d2")).distinct()
    merged = (daily.join(days, daily["_day"] <= days["_d2"])
              .select("_d2", "_h").distinct())
    wm = W.partitionBy("_d2").orderBy("_h")
    r = merged.withColumn("_rk", F.row_number().over(wm)).filter(
        F.col("_rk") <= k)
    est = F.when(
        F.count("*") < F.lit(k), F.count("*").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / (F.max(F.when(F.col("_rk") == k, F.col("_h"))) / F.lit(TWO_60)))
    sk = r.groupBy("_d2").agg(F.round(est, 6).alias("kmv_estimate"))
    # Exact cumulative distinct for reference: first-seen day per
    # value, then a triangle sum over the (bounded) day list.
    first = (dh.groupBy("_h").agg(F.min("_day").alias("_fd"))
             .groupBy("_fd").agg(F.count("*").alias("_nf")))
    exact = (first.join(days, first["_fd"] <= days["_d2"])
             .groupBy("_d2").agg(F.sum("_nf").cast("long")
                                 .alias("n_exact")))
    return (sk.join(exact, "_d2")
            .select(F.col("_d2").cast("string").alias("day"),
                    "n_exact", "kmv_estimate"))
