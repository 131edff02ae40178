"""One-pass dataset profiling.

``profile_table`` computes per-column audit stats — row count, null
count, exact distinct count, min/max (as strings) — in a SINGLE
aggregation pass over the table, then unpivots to one row per column.
This is the ingestion-time data-quality gate: schema drift shows up as
new/blank columns, corruption as null spikes, id collisions as
distinct-count drops.

Scale note: exact COUNT(DISTINCT) per column rewrites into expand +
two-phase aggregate (one shuffle per distinct column set). At 100 TB
swap ``exact_distinct=False`` to use HLL sketches
(approx_count_distinct) — same single scan, no expand, ~2% error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from data_ingest_spark.extensions.text import tokens_col
from data_ingest_spark.functions.stats import epoch_seconds


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column. min/max are stringified for a uniform schema."""
    cols = cols or df.columns
    nd = (F.count_distinct if exact_distinct
          else lambda c: F.approx_count_distinct(c))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("_n").cast("long").alias("n_rows"),
                 F.col(f"_nn_{c}").cast("long").alias("n_nulls"),
                 F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                 F.col(f"_min_{c}").alias("min_value"),
                 F.col(f"_max_{c}").alias("max_value"))
        for c in cols])
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def token_drift(df: DataFrame, group_col: str = "source", top_k: int = 5,
                text_col: str = "text") -> DataFrame:
    """Distribution-drift detector: for each group (corpus slice), the
    ``top_k`` most over-represented tokens versus the whole corpus.

    The drift score is the exact-integer cross product
    ``n_gt * total_tokens - n_t * group_tokens`` (positive ⇔ token t is
    over-represented in group g relative to the corpus) — the numerator
    of the p_g(t) − p(t) difference cleared of denominators. Integer
    arithmetic keeps it bit-exact across engines and summation orders,
    where a float KL/PSI would differ in the last ulp.

    Plan shape: one explode → one groupBy(group, token) map-side
    combined count; the token-marginal and the two totals derive from
    that aggregate (token marginal is a second small shuffle on token);
    the top-k per group is a window over groups — parallel across
    groups, partition size = vocabulary of one group. At 100 TB the
    per-(group, token) aggregate is the only corpus-sized shuffle.
    """
    from pyspark.sql import Window as W
    tok = df.select(F.col(group_col).alias("grp"),
                    F.explode(tokens_col(text_col)).alias("token"))
    gt = tok.groupBy("grp", "token").agg(F.count("*").alias("n_gt"))
    t_marg = gt.groupBy("token").agg(F.sum("n_gt").alias("n_t"))
    g_tot = gt.groupBy("grp").agg(F.sum("n_gt").alias("g_tokens"))
    total = gt.agg(F.sum("n_gt").alias("all_tokens"))
    # t_marg is vocabulary-sized — leave the join strategy to AQE
    # (shuffle-join on token at 100 TB; auto-broadcast when small).
    scored = (gt.join(t_marg, "token")
              .join(F.broadcast(g_tot), "grp")
              .crossJoin(F.broadcast(total))
              .select("grp", "token",
                      (F.col("n_gt") * F.col("all_tokens")
                       - F.col("n_t") * F.col("g_tokens"))
                      .alias("drift_score")))
    w = W.partitionBy("grp").orderBy(F.col("drift_score").desc(),
                                     F.col("token").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .select(F.col("grp").alias(group_col), "token",
                    "drift_score", F.col("rk").cast("long").alias("rk")))


DECAY_SCALE = 1_000_000


def decayed_counts(events: DataFrame, half_life_s: float,
                   asof_expr: str, key_col: str = "user_id",
                   ts_col: str = "ts") -> DataFrame:
    """Feature-store primitive: per-key exponentially-decayed event
    count and value mass as of a reference instant —
    ``w = 0.5^(age / half_life)`` — recency-weighted activity features
    for ranking/training.

    Determinism at the float boundary (the x39 pattern): each row's
    decay weight is fixed-pointed once (round(w·1e6) as int64, a pure
    per-row function), the per-key reduction is an exact integer sum,
    and the final rescale is the only float step — so the aggregate is
    independent of summation order and engine.

    Map-only weight computation + one groupBy(key): at 100 TB this is
    a single shuffle of (key, int, int) partial sums."""
    # Fractional-second age (cast-to-double keeps microseconds, like
    # DuckDB's epoch()); weight via exp(ln(0.5)·age/hl) with ln(0.5)
    # as a shared literal so the only libm call is the trusted exp.
    LN_HALF = -0.6931471805599453
    ts_s = epoch_seconds(ts_col)
    asof_s = epoch_seconds(F.expr(asof_expr))
    age = asof_s - ts_s
    w_i = F.round(F.exp(F.lit(LN_HALF) * age / F.lit(half_life_s))
                  * DECAY_SCALE).cast("long")
    return (events
            .filter(ts_s <= asof_s)
            .select(F.col(key_col), w_i.alias("_w"),
                    F.col("value"))
            .groupBy(key_col)
            .agg(F.round(F.sum("_w") / DECAY_SCALE, 6)
                 .alias("decayed_count"),
                 F.count("*").cast("long").alias("n_events")))


def source_overlap(df: DataFrame, source_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Cross-source content-overlap matrix: for every source pair
    (a < b), how many distinct content hashes they share — the
    curation diagnostic that finds mirrored / re-crawled feeds before
    dedup collapses them. Returns ``(source_a, source_b, n_shared)``.

    Plan: each side reduces to DISTINCT (source, hash) — one 48-byte
    row per (source, content) — before the hash-keyed self-join, so
    the shuffle carries the content census, never the corpus."""
    h = (df.select(F.col(source_col).alias("_s"),
                   F.md5(F.col(text_col).cast("binary")).alias("_h"))
         .distinct())
    a = h.select(F.col("_s").alias("source_a"), "_h")
    b = h.select(F.col("_s").alias("source_b"), "_h")
    return (a.join(b, "_h")
            .filter(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count("*").cast("long").alias("n_shared")))


def ks_drift(df: DataFrame, group_col: str = "source",
             value_col: str = "n_chars") -> DataFrame:
    """Per-group Kolmogorov–Smirnov drift statistic: for every group
    g, D_g = max over observed values v of
    |CDF_g(v) − CDF_global(v)| — the standard "did this source's
    length/quality distribution shift?" monitor run between crawl
    snapshots and across mixture sources. Returns
    ``(source, n_docs, ks_stat)`` with ks_stat rounded to 6dp.

    Determinism: all CDF numerators/denominators are exact integer
    counts; each CDF value is a single long/long → double division
    and the max of |a − b| is order-insensitive — hash-exact vs the
    SQL oracle.

    Plan shape: ONE corpus-sized shuffle (the (group, v) count,
    materialized once via a lazy localCheckpoint — unlike persist(),
    its blocks are GC-reclaimed when the query's frames go out of
    scope, so a long multi-query session does not accumulate storage;
    every later step derives from that bounded aggregate: |groups| ×
    |distinct v| of a bounded metric column). The global CDF rides
    along as an extra partition of the same cumulative-sum window, so
    the window is always partitioned, and the grid joins broadcast.
    Real groups are keyed with a 'g:' prefix and the global partition
    as the bare literal 'all' — disjoint namespaces BY CONSTRUCTION,
    so a source literally named '__all__' (or 'all') is just another
    group, never silently merged into the global CDF."""
    ALL = "all"
    cv = (df.groupBy(group_col, value_col)
          .agg(F.count("*").alias("_c"))).localCheckpoint(eager=False)
    key = F.concat(F.lit("g:"), F.col(group_col).cast("string"))
    gv = (cv.groupBy(value_col).agg(F.sum("_c").alias("_c"))
          .select(F.lit(ALL).alias("_k"), F.col(value_col),
                  F.col("_c").cast("long").alias("_c")))
    counts = (cv.select(key.alias("_k"), F.col(value_col),
                        F.col("_c").cast("long").alias("_c"))
              .unionByName(gv))
    groups = counts.select("_k").distinct()
    vals = cv.select(value_col).distinct()
    grid = (groups.crossJoin(vals)
            .join(counts, ["_k", value_col], "left")
            .fillna({"_c": 0}))
    wcum = (W.partitionBy("_k").orderBy(value_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    cum = (grid.withColumn("_cum", F.sum("_c").over(wcum).cast("long"))
           .localCheckpoint(eager=False))
    tots = cum.groupBy("_k").agg(F.max("_cum").alias("_n"))
    cdf = (cum.join(F.broadcast(tots), "_k")
           .select("_k", value_col,
                   (F.col("_cum") / F.col("_n")).alias("_f")))
    glob = (cdf.filter(F.col("_k") == ALL)
            .select(F.col(value_col), F.col("_f").alias("_fg")))
    names = cv.select(key.alias("_k"), F.col(group_col)).distinct()
    return (cdf.filter(F.col("_k") != ALL)
            .join(glob, value_col)
            .groupBy("_k")
            .agg(F.round(F.max(F.abs(F.col("_f") - F.col("_fg"))), 6)
                 .alias("ks_stat"))
            .join(F.broadcast(tots.filter(F.col("_k") != ALL)
                              .select("_k", F.col("_n").alias("n_docs"))),
                  "_k")
            .join(F.broadcast(names), "_k")
            .select(group_col, F.col("n_docs").cast("long").alias("n_docs"),
                    "ks_stat"))


def winsorize_stats(df: DataFrame, group_col: str = "event_type",
                    value_col: str = "value", lo: float = 0.05,
                    hi: float = 0.95, scale: int = 10**6) -> DataFrame:
    """Per-group winsorization audit: exact interpolated quantile clip
    bounds (the e8 percentile ≡ quantile_cont convention, rounded to
    6dp BEFORE use so both engines clip against identical bounds),
    the count of rows clipped on each side, and the fixed-point sum
    of the clipped values — the robust-cleaning step (cap outliers at
    p05/p95) expressed so every output is order-independent:
    counts are integers and the clipped sum quantizes per-row to
    int64 before aggregation. Returns ``(group, q_lo, q_hi, n_total,
    n_below, n_above, sum_clipped_fp)``.

    Plan: one grouped percentile pass, bounds broadcast back, one
    grouped aggregation — two corpus reads, no window."""
    q = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, {lo})"), 6).alias("q_lo"),
        F.round(F.expr(f"percentile({value_col}, {hi})"), 6).alias("q_hi"))
    j = df.join(F.broadcast(q), group_col)
    clipped = F.least(F.greatest(F.col(value_col), F.col("q_lo")),
                      F.col("q_hi"))
    return (j.groupBy(group_col, "q_lo", "q_hi")
            .agg(F.count("*").cast("long").alias("n_total"),
                 F.sum((F.col(value_col) < F.col("q_lo")).cast("long"))
                 .cast("long").alias("n_below"),
                 F.sum((F.col(value_col) > F.col("q_hi")).cast("long"))
                 .cast("long").alias("n_above"),
                 F.sum(F.floor(clipped * scale + F.lit(0.5)).cast("long"))
                 .cast("long").alias("sum_clipped_fp")))


def profile_drift(a: DataFrame, b: DataFrame,
                  cols: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Snapshot-to-snapshot profile drift: run ``profile_table`` on
    two versions of a table and report, per column, the row/null/
    distinct deltas and whether the min/max moved — the ingestion
    gate that catches schema rot (null spikes, id-space collapse,
    silent range shifts) between crawl or CDC snapshots. Returns
    ``(column, n_rows_delta, n_nulls_delta, n_distinct_delta,
    min_changed, max_changed)``; every field is an exact integer or
    a string-equality flag, so the drift report hash-matches a SQL
    oracle.

    Plan: two single-pass profiles (one aggregation each) joined on
    the tiny per-column result."""
    pa = profile_table(a, cols, exact_distinct)
    pb = profile_table(b, cols, exact_distinct)
    sel = lambda p, sfx: p.select(
        "column", F.col("n_rows").alias("nr" + sfx),
        F.col("n_nulls").alias("nn" + sfx),
        F.col("n_distinct").alias("nd" + sfx),
        F.col("min_value").alias("mn" + sfx),
        F.col("max_value").alias("mx" + sfx))
    return (sel(pa, "_a").join(sel(pb, "_b"), "column")
            .select(
                "column",
                (F.col("nr_b") - F.col("nr_a")).cast("long")
                .alias("n_rows_delta"),
                (F.col("nn_b") - F.col("nn_a")).cast("long")
                .alias("n_nulls_delta"),
                (F.col("nd_b") - F.col("nd_a")).cast("long")
                .alias("n_distinct_delta"),
                (~F.col("mn_a").eqNullSafe(F.col("mn_b")))
                .alias("min_changed"),
                (~F.col("mx_a").eqNullSafe(F.col("mx_b")))
                .alias("max_changed")))


def quantile_normalize(df: DataFrame, value_col: str = "n_chars",
                       group_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """Cross-group quantile normalization: replace each row's value
    with the GLOBAL value at its within-group mid-rank quantile, so
    every group's normalized distribution matches the corpus — the
    rank-based batch-effect fix for per-source score drift (a "0.8
    quality" from a lenient source and a strict one stop meaning
    different things before thresholding or mixing).

    Exact end to end: the within-group quantile q = (2r−1)/(2n_g) maps
    to global position p = ceil(q·N) computed entirely in integer
    arithmetic — ((2r−1)·N + 2n_g − 1) div (2n_g) — and the lookup is
    an equi-join on position; ranks tie-break on id in both engines.

    Plan: per-group rank (partitioned window), the bucketed two-pass
    GLOBAL rank (coarse value buckets, offsets = one collected row per
    bucket — never an unpartitioned window), one position equi-join.
    Three corpus shuffles total, no driver-side per-row data."""
    from pyspark.sql import Window as W

    d = df.select(id_col, group_col, value_col)
    wg = W.partitionBy(group_col).orderBy(F.col(value_col),
                                          F.col(id_col))
    s = (d.withColumn("src_rank", F.row_number().over(wg).cast("long"))
         .withColumn("_ns", F.count("*").over(W.partitionBy(group_col))
                     .cast("long")))
    # two-pass global rank over (value, id): coarse = value div 64
    g = d.withColumn("_cb", (F.col(value_col).cast("long") / 64)
                     .cast("long"))
    sizes = (g.groupBy("_cb").agg(F.count("*").alias("n"))
             .orderBy("_cb").collect())
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_cb"]] = acc
        acc += r["n"]
    n_total = acc
    if n_total == 0:
        return (s.select(id_col, group_col, value_col, "src_rank")
                .withColumn("norm_value", F.lit(None).cast("long")))
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items()
                            for x in kv])
    wcb = W.partitionBy("_cb").orderBy(F.col(value_col), F.col(id_col))
    gpos = (g.withColumn("gpos", (F.row_number().over(wcb)
                                  + offmap[F.col("_cb")]).cast("long"))
            .select(F.col("gpos"),
                    F.col(value_col).cast("long").alias("_gval")))
    p = s.withColumn(
        "_gp", F.expr(f"((2*src_rank - 1) * {n_total} + 2*_ns - 1)"
                      f" div (2*_ns)"))
    return (p.join(gpos, p["_gp"] == gpos["gpos"])
            .select(id_col, group_col, value_col, "src_rank",
                    F.col("_gval").alias("norm_value")))


def column_expectations(df: DataFrame, cols: list[str],
                        regex_rules: dict[str, str] | None = None
                        ) -> DataFrame:
    """Per-column data-quality EXPECTATIONS gate — the acceptance
    check a pipeline runs on every new batch before it may enter the
    corpus. :func:`profile_table` is the descriptive census sibling
    (counts/min/max for drift eyeballing); this emits the decision
    inputs a gate thresholds on: null FRACTION, exact distinct count,
    and per-column regex match RATES (``regex_rules`` — id formats,
    enum shapes), all from one pass. For each requested column: row
    count, null count, null fraction, exact distinct count, and the
    lexicographic min/max of the VARCHAR rendering (type-agnostic, so
    one report schema covers numeric, string, date, and decimal
    columns). Returns one row per column:
    ``(column, n_rows, n_null, null_frac, n_distinct, min_value,
    max_value, regex_match_frac)`` (match_frac NULL when no rule).

    Determinism: counts are exact integers; fractions are single
    long/long divisions rounded to 9dp; min/max compare canonical
    strings — every value hash-checkable cross-engine.

    Plan: TWO pruned aggregation passes joined as 1-row frames — the
    plain metrics (counts/nulls/min/max/regex) in one scan, the exact
    multi-column distincts in another. Fusing them into one agg makes
    Spark expand every row N+1 ways (one copy per DISTINCT clause)
    with ALL the other aggregation buffers riding each copy — measured
    ~3.5× slower than the two pruned scans. At 100 TB both passes
    prune to the profiled columns and shuffle one row each; swap
    approx_count_distinct in (profile_table's exact_distinct=False
    convention) to get back to a single pass with ~2% error."""
    rules = regex_rules or {}
    aggs = [F.count("*").cast("long").alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"_null_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
        ]
        if c in rules:
            aggs.append(
                F.sum(F.when(s.rlike(rules[c]), 1).otherwise(0))
                .cast("long").alias(f"_rx_{c}"))
    nd = df.agg(*[F.count_distinct(F.col(c)).cast("long")
                  .alias(f"_nd_{c}") for c in cols])
    one = df.agg(*aggs).crossJoin(F.broadcast(nd))
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.round(F.col(f"_null_{c}") / F.col("_n"), 9)
            .alias("null_frac"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            (F.round(F.col(f"_rx_{c}") / F.col("_n"), 9)
             if c in rules else F.lit(None).cast("double"))
            .alias("regex_match_frac"),
        ) for c in cols])
    return one.select(F.explode(rows).alias("_r")).select("_r.*")


def mannwhitney_u(df: DataFrame, group_col: str = "event_type",
                  val_col: str = "value") -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) of each group's values
    against the rest of the corpus, with midrank tie handling and the
    tie-corrected normal approximation — the nonparametric "is this
    segment's metric distribution shifted" test that backs drift
    triage when KS (x96) flags a source. Every building block is an
    exact integer (value counts, cumulative less-than counts, tie
    spectrum Σ(t³−t)); midranks are exact half-integers, so the rank
    sums are order-independent doubles and the one z formula is
    pinned — fully value-checkable.

    Global ranks use the bucketed two-pass pattern (floor(value)
    coarse buckets → in-bucket cumulative window → collected bucket
    prefix offsets, bounded by the value RANGE, not the row count) —
    the same construction as epoch_shuffle/dense_ids_scalable, never
    a single-task global sort.

    Returns ``(group, n_g, u_stat, z)`` per group.
    """
    e = df.select(F.col(group_col).alias("_g"),
                  F.col(val_col).cast("double").alias("_v"))
    vc = e.groupBy("_v", "_g").agg(F.count("*").alias("_c"))
    tv = (vc.groupBy("_v").agg(F.sum("_c").alias("_t"))
          .withColumn("_b", F.floor("_v").cast("long")))
    sizes = (tv.groupBy("_b").agg(F.sum("_t").alias("_bt"))
             .orderBy("_b").collect())
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_b"]] = acc
        acc += r["_bt"]
    if not offsets:
        return df.sparkSession.createDataFrame(
            [], f"{group_col} string, n_g long, u_stat double, z double")
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    wb = (W.partitionBy("_b").orderBy("_v")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    rk = (tv.withColumn("_cum", F.sum("_t").over(wb))
          .withColumn("_less",
                      offmap[F.col("_b")] + F.col("_cum") - F.col("_t"))
          .select("_v", "_t", "_less"))
    rg = (vc.join(rk, "_v")
          .groupBy("_g")
          .agg(F.sum("_c").cast("long").alias("_ng"),
               F.sum(F.col("_c")
                     * (F.col("_less").cast("double")
                        + (F.col("_t").cast("double") + 1.0) / 2.0))
               .alias("_rg")))
    tot = (tv.agg(F.sum("_t").cast("double").alias("_nn"),
                  F.sum(F.col("_t") * F.col("_t") * F.col("_t")
                        - F.col("_t")).cast("double").alias("_tie")))
    ng = F.col("_ng").cast("double")
    u = F.col("_rg") - ng * (ng + 1.0) / 2.0
    var = (ng * (F.col("_nn") - ng) / 12.0
           * ((F.col("_nn") + 1.0)
              - F.col("_tie") / (F.col("_nn") * (F.col("_nn") - 1.0))))
    z = (u - ng * (F.col("_nn") - ng) / 2.0) / F.sqrt(var)
    return (rg.crossJoin(F.broadcast(tot))
            .select(F.col("_g").alias(group_col),
                    F.col("_ng").alias("n_g"),
                    F.round(u, 6).alias("u_stat"),
                    F.round(z, 6).alias("z")))


def psi_drift(df: DataFrame, group_col: str = "event_type",
              val_col: str = "value", side_col=None,
              bucket_width: float = 50.0) -> DataFrame:
    """Population Stability Index between a reference and a current
    slice of each group's value distribution — THE industry drift
    gate (PSI < 0.1 stable / 0.1-0.25 shifting / > 0.25 drifted),
    complementing KS (x96: max CDF gap) and Mann-Whitney (x133:
    location shift) with a binned mass-movement measure that also
    localizes WHICH buckets moved. ``side_col`` is a boolean Column
    marking the reference slice (default: even event_id — a
    deterministic A/A split whose PSI ≈ 0 is itself the calibration
    check).

    Laplace 0.5 smoothing on both sides keeps empty buckets finite
    (the standard correction) and makes every share strictly positive,
    so PSI is defined wherever either side has mass. One grouped
    count over (group, bucket, side) — a single corpus shuffle; the
    per-bucket PSI terms reduce over at most range/width buckets.
    Returns ``(group, n_buckets, psi)``.
    """
    side = (side_col if side_col is not None
            else (F.col("event_id") % 2 == 0))
    b = F.floor(F.col(val_col) / bucket_width).cast("long")
    counts = (df.select(F.col(group_col).alias("_g"), b.alias("_b"),
                        side.alias("_ref"))
              .groupBy("_g", "_b")
              .agg(F.sum(F.when(F.col("_ref"), 1).otherwise(0))
                   .cast("long").alias("_cr"),
                   F.sum(F.when(F.col("_ref"), 0).otherwise(1))
                   .cast("long").alias("_cc")))
    tots = counts.groupBy("_g").agg(
        F.sum("_cr").cast("double").alias("_nr"),
        F.sum("_cc").cast("double").alias("_nc"),
        F.count("*").cast("double").alias("_nb"))
    j = counts.join(F.broadcast(tots), "_g")
    p = ((F.col("_cr").cast("double") + 0.5)
         / (F.col("_nr") + 0.5 * F.col("_nb")))
    q = ((F.col("_cc").cast("double") + 0.5)
         / (F.col("_nc") + 0.5 * F.col("_nb")))
    term = (p - q) * F.log(p / q)
    return (j.groupBy(F.col("_g").alias(group_col))
            .agg(F.count("*").cast("long").alias("n_buckets"),
                 F.round(F.sum(term), 6).alias("psi")))


def gap_regularity(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   min_gaps: int = 7,
                   cv_threshold: float = 0.5) -> DataFrame:
    """Bot/automation detection by inter-event timing regularity: the
    coefficient of variation (σ/μ) of a user's inter-event gaps.
    Humans are bursty (cv ≳ 1); schedulers and scripts are metronomic
    (cv ≈ 0). Flags users with ≥ ``min_gaps`` gaps and cv below the
    threshold.

    Determinism: gaps are exact integer MICROSECONDS (lag over a
    (user; ts, id)-ordered window — the id tie-break makes duplicate
    timestamps deterministic); moments are exact decimal(38,0)
    aggregates (Σx up to 2^53 is double-exact, Σx² is not — same
    convention as auc_rank). The mean is rounded half-up IN INTEGER
    µs — (2Σx + n) div 2n — because Σx/n lands exactly on half-µs
    boundaries whenever n | 2Σx, where double ROUND(x, 6) is
    engine-divergent (DuckDB's ×1e6 drifts a hair below the half);
    the remaining floating math is one cast-divide-sqrt chain per
    user, identical in both engines.

    One partitioned window + one groupBy(user) — a single shuffle on
    the user key at any scale."""
    wl = W.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet TIMESTAMP(NTZ) → session-tz TIMESTAMP is lossless here
    # and matches DuckDB's epoch_us (same convention as x119).
    g = (events.withColumn(
            "_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
         .withColumn("_gap", F.col("_us") - F.lag("_us").over(wl))
         .filter(F.col("_gap").isNotNull())
         .select(user_col, F.col("_gap").cast("decimal(38,0)").alias("_g")))
    agg = g.groupBy(user_col).agg(
        F.count("*").alias("n_gaps"),
        F.sum("_g").alias("_s"),
        F.sum(F.col("_g") * F.col("_g")).alias("_ss"))
    n = F.col("n_gaps")
    sd = F.col("_s").cast("double")
    num = (n.cast("decimal(38,0)") * F.col("_ss")
           - F.col("_s") * F.col("_s")).cast("double")
    den = (n * (n - 1)).cast("double")
    cv = F.sqrt(num / den) / (sd / n)
    mean_us = F.expr("(2 * CAST(_s AS BIGINT) + n_gaps) "
                     "div (2 * n_gaps)")
    return (agg.filter((n >= min_gaps) & (F.col("_s") > 0))
            .select(user_col, "n_gaps",
                    (mean_us.cast("double") / F.lit(1000000.0))
                    .alias("mean_gap_s"),
                    F.round(cv, 6).alias("cv_gap"),
                    (cv < F.lit(cv_threshold)).alias("is_regular")))


def gini_by_group(df: DataFrame, group_col: str = "source",
                  value_col: str = "n_chars",
                  id_col: str = "doc_id") -> DataFrame:
    """Gini concentration of a non-negative integer measure within
    each group — the corpus-balance audit (how concentrated is the
    token/byte mass of each source across its documents; G=0 uniform,
    G→1 a few documents dominate). Rank formula
    G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over ascending xᵢ.

    Determinism: ranks come from a (value, id)-ordered partitioned
    window, and Σ i·xᵢ is invariant under permutation of tied values,
    so ties cannot flip the result; numerator and denominator are
    exact int64, divided once."""
    wr = W.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = (df.withColumn("_rk", F.row_number().over(wr))
              .select(group_col, F.col(value_col).cast("long").alias("_x"),
                      "_rk"))
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_rk") * F.col("_x")).alias("_sxr"))
    num = (F.lit(2) * F.col("_sxr")
           - (F.col("n_docs") + 1) * F.col("_sx")).cast("double")
    den = (F.col("n_docs") * F.col("_sx")).cast("double")
    return agg.select(group_col, "n_docs",
                      F.round(num / den, 6).alias("gini"))


def js_divergence(a: DataFrame, b: DataFrame, text_col: str = "text",
                  buckets: int = 64) -> DataFrame:
    """Jensen–Shannon divergence (nats) between the hashed-token
    distributions of two corpus slices — the symmetric, bounded
    (≤ ln 2) drift metric for comparing token mixes across sources,
    snapshots, or train/eval splits (PSI's cousin: JSD is defined even
    when a bucket is empty on one side).

    Tokens hash into ``buckets`` fixed buckets via the md5-prefix
    int64 (cross-engine exact), so the distributions are bounded-state
    aggregates: two token explodes, one groupBy(bucket) each, a
    buckets-sized outer join, one final fold — corpus-size-independent
    memory at any scale."""
    def _counts(df: DataFrame, name: str) -> DataFrame:
        tok = df.select(F.explode(tokens_col(text_col)).alias("_t"))
        bkt = (F.conv(F.substring(F.md5(F.col("_t").cast("binary")), 1, 7),
                      16, 10).cast("long") % buckets)
        return (tok.select(bkt.alias("bucket"))
                .groupBy("bucket").agg(F.count("*").alias(name)))
    # ≤ buckets rows; materialized once via a lazy localCheckpoint so
    # the totals crossJoin doesn't re-run both corpus scans (the
    # ks_drift pattern — GC-reclaimable, unlike persist).
    j = (_counts(a, "ca").join(_counts(b, "cb"), "bucket", "full")
         .select("bucket", F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb"))
         .localCheckpoint(eager=False))
    tot = j.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    p = F.col("ca").cast("double") / F.col("ta")
    q = F.col("cb").cast("double") / F.col("tb")
    m = (p + q) / F.lit(2.0)
    term = (F.when(F.col("ca") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
            + F.when(F.col("cb") > 0, q * F.log(q / m)).otherwise(F.lit(0.0)))
    return (j.crossJoin(F.broadcast(tot))
            .agg(F.sum(F.when(F.col("ca") > 0, 1).otherwise(0))
                 .cast("long").alias("n_buckets_a"),
                 F.sum(F.when(F.col("cb") > 0, 1).otherwise(0))
                 .cast("long").alias("n_buckets_b"),
                 F.round(F.sum(term) / F.lit(2.0), 6).alias("jsd")))


def k_anonymity(df: DataFrame, quasi_cols: list[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: every
    equivalence class (distinct quasi-identifier combination) smaller
    than ``k`` re-identifies its members. Returns the at-risk classes
    with their sizes — the data-governance gate a release pipeline
    runs before publishing derived tables.

    One groupBy on the quasi-identifier tuple; the output is bounded
    by the number of SMALL classes, which shrinks as data grows — the
    rare audit that gets cheaper at 100 TB."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").cast("long").alias("class_size"))
            .filter(F.col("class_size") < k))


def srm_check(df: DataFrame, arm_col: str = "arm",
              ratios: list[float] | None = None) -> DataFrame:
    """Sample-ratio-mismatch gate for experiment assignment: observed
    unit counts per arm vs the expected split, with each arm's
    chi-square contribution (o−e)²/e — the first thing to check
    before reading any A/B result; a skewed split means broken
    randomization, not a treatment effect. (The chi-square statistic
    is Σ of the contribution column; critical values are the caller's
    lookup — no p-value CDF crosses the engine boundary.)

    One groupBy(arm) + a broadcast total: counts are exact integers,
    the expected split enters as driver-side literals, one
    multiply-divide chain per arm rounded 6dp."""
    ratios = ratios or [0.5, 0.5]
    rmap = F.array(*[F.lit(float(r)) for r in ratios])
    counts = df.groupBy(arm_col).agg(F.count("*").alias("observed"))
    total = counts.agg(F.sum("observed").alias("_n"))
    # The arm domain must be VALIDATED, not positionally indexed: a
    # string arm label ('control') or an integer outside
    # 0..len(ratios)-1 indexes the ratio array to NULL, silently
    # NULLing expected/chi2_contrib — the exact broken-assignment
    # signal this gate exists to catch. Out-of-domain arms fail the
    # query loudly instead (raise_error evaluates per-row only on
    # the unmatched branch).
    arm_idx = F.col(arm_col).try_cast("int")
    in_domain = (arm_idx.isNotNull()
                 & (arm_idx >= 0) & (arm_idx < len(ratios))
                 & (arm_idx.cast("string")
                    == F.col(arm_col).cast("string")))
    bad = F.raise_error(F.concat(
        F.lit("srm_check: arm value outside the configured ratio "
              "domain 0..%d: " % (len(ratios) - 1)),
        F.coalesce(F.col(arm_col).cast("string"), F.lit("NULL"))))
    e = F.when(in_domain, F.col("_n") * rmap[arm_idx]) \
         .otherwise(bad.cast("double"))
    contrib = ((F.col("observed") - e) * (F.col("observed") - e)) / e
    return (counts.crossJoin(F.broadcast(total))
            .select(arm_col,
                    F.col("observed").cast("long").alias("observed"),
                    F.round(e, 6).alias("expected"),
                    F.round(contrib, 6).alias("chi2_contrib")))


def hourly_xcorr(events: DataFrame, type_a: str = "click",
                 type_b: str = "purchase", lags: tuple = (0, 1),
                 ts_col: str = "ts") -> DataFrame:
    """Cross-correlation between two event streams' hourly count
    series at the given hour lags — "do purchases track clicks, and
    with what delay?", the monitoring / causal-sniff primitive.
    Pearson r over the DENSIFIED hour grid (missing hours are real
    zeros — skipping them biases r toward co-active hours; the grid
    comes from an exact integer sequence over the observed span).

    Determinism: counts are exact integers on an exact hour grid, all
    five moment sums are exact int64 (counts ≤ events/hour, hours
    bounded by the span), and r = cov/√(var_a·var_b) is one
    sqrt-divide chain over those integers, rounded 6dp. Two shuffles
    (hour-grid aggregate, lag-join) regardless of lag count."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select((F.floor(us / 3_600_000_000)).alias("h"),
                        F.col("event_type"))
    counts = (hrs.filter(F.col("event_type").isin(type_a, type_b))
              .groupBy("h")
              .agg(F.sum((F.col("event_type") == type_a).cast("int"))
                   .alias("ca"),
                   F.sum((F.col("event_type") == type_b).cast("int"))
                   .alias("cb")))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    # span-bounded rows; materialized once via a lazy localCheckpoint
    # so each lag branch (two join sides per lag) doesn't re-derive
    # the corpus-side count subtree (the ks_drift pattern)
    grid = (span.select(F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(counts, "h", "left")
            .select("h", F.coalesce("ca", F.lit(0)).alias("ca"),
                    F.coalesce("cb", F.lit(0)).alias("cb"))
            .localCheckpoint(eager=False))
    out = None
    for lag in lags:
        a = grid.select(F.col("h"), F.col("ca"))
        b = grid.select((F.col("h") - lag).alias("h"),
                        F.col("cb").alias("cb_l"))
        j = a.join(b, "h")
        n = F.count("*")
        sa, sb = F.sum("ca"), F.sum("cb_l")
        saa = F.sum(F.col("ca") * F.col("ca"))
        sbb = F.sum(F.col("cb_l") * F.col("cb_l"))
        sab = F.sum(F.col("ca") * F.col("cb_l"))
        cov = (n * sab - sa * sb).cast("double")
        va = (n * saa - sa * sa).cast("double")
        vb = (n * sbb - sb * sb).cast("double")
        row = j.agg(
            F.lit(lag).cast("long").alias("lag_hours"),
            n.cast("long").alias("n_hours"),
            F.round(cov / F.sqrt(va * vb), 6).alias("pearson_r"))
        out = row if out is None else out.unionByName(row)
    return out


def cusum_changepoint(events: DataFrame, type_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """Most-likely level-shift changepoint per event stream via the
    CUSUM statistic over the densified hourly count series: with
    partial sums P_t and grand total S over N hours, the scaled
    deviation D_t = N·P_t − t·S peaks in magnitude at the most likely
    changepoint (the exact-integer form of Σ(x_i − μ) — multiplying
    through by N clears the rational mean). KS/PSI (x96/x138) say IF
    two slices differ; CUSUM says WHEN a stream shifted.

    Fully integer-exact end to end — counts, partials, D_t, and the
    (|D| desc, hour asc) argmax are all int64; there is NO float in
    the output, so the oracle match is bit-for-bit by construction.
    One hour-grid aggregate + one per-type window cumsum + one
    per-type argmax — two shuffles on the type key."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select(F.col(type_col).alias("_ty"),
                        F.floor(us / 3_600_000_000).alias("h"))
    counts = hrs.groupBy("_ty", "h").agg(F.count("*").alias("c"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = counts.select("_ty").distinct()
    grid = (types.crossJoin(F.broadcast(span))
            .select("_ty", F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(counts, ["_ty", "h"], "left")
            .select("_ty", "h", F.coalesce("c", F.lit(0)).alias("c")))
    wcum = (W.partitionBy("_ty").orderBy("h")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    wall = W.partitionBy("_ty")
    d = (grid
         .withColumn("_p", F.sum("c").over(wcum))
         .withColumn("_t", F.row_number().over(
             W.partitionBy("_ty").orderBy("h")))
         .withColumn("_s", F.sum("c").over(wall))
         .withColumn("_n", F.count("*").over(wall))
         .withColumn("_d", F.col("_n") * F.col("_p")
                     - F.col("_t") * F.col("_s")))
    wpick = W.partitionBy("_ty").orderBy(F.abs(F.col("_d")).desc(),
                                         F.col("h").asc())
    return (d.withColumn("_rk", F.row_number().over(wpick))
            .filter(F.col("_rk") == 1)
            .select(F.col("_ty").alias(type_col),
                    F.col("h").cast("long").alias("changepoint_hour"),
                    F.abs(F.col("_d")).cast("long").alias("peak_cusum"),
                    F.col("_n").cast("long").alias("n_hours")))


def stratified_uplift(events: DataFrame, user_col: str = "user_id",
                      conv_type: str = "purchase",
                      n_strata: int = 4) -> DataFrame:
    """Stratified conversion uplift between two experiment arms
    (user-id parity here; the assignment column in production):
    per-stratum conversion rates and their difference, where strata
    are activity-volume buckets — the standard post-stratification
    that removes activity imbalance an SRM check (x153) can't see.

    Exact integer unit/conversion counts per (stratum, arm); the only
    floats are the two rate divisions and their difference, rounded
    6dp. Two shuffles: per-user rollup, then the stratum aggregate."""
    per_user = (events.groupBy(user_col).agg(
        F.count("*").alias("_n_ev"),
        F.max((F.col("event_type") == conv_type).cast("int"))
        .alias("_conv")))
    stratum = F.least(F.lit(n_strata - 1),
                      F.floor(F.col("_n_ev") / 25).cast("int"))
    armed = per_user.select(
        (F.col(user_col) % 2).cast("int").alias("arm"),
        stratum.alias("stratum"), F.col("_conv"))
    agg = (armed.groupBy("stratum").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("_conv")).otherwise(0))
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("_conv")).otherwise(0))
        .alias("c1")))
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    return (agg.filter((F.col("n0") > 0) & (F.col("n1") > 0))
            .select(F.col("stratum").cast("long").alias("stratum"),
                    F.col("n0").cast("long").alias("n_control"),
                    F.col("n1").cast("long").alias("n_treat"),
                    F.round(r0, 6).alias("rate_control"),
                    F.round(r1, 6).alias("rate_treat"),
                    F.round(r1 - r0, 6).alias("uplift")))


def seasonal_naive_backtest(events: DataFrame,
                            type_col: str = "event_type",
                            ts_col: str = "ts",
                            season: int = 24) -> DataFrame:
    """Backtest of the seasonal-naïve forecaster (ŷ_t = y_{t−season})
    against the naïve-1 baseline (ŷ_t = y_{t−1}) on each stream's
    densified hourly counts: per-stream MAE of both and their ratio —
    MASE < 1 means the daily cycle carries real signal. The honest
    floor every fancy forecaster must beat, and the first diagnostic
    for "is this stream seasonal at all".

    Exact integer errors (counts on an exact hour grid, integer
    |y−ŷ| sums); the MAEs and their ratio are the only floats,
    rounded 6dp. One grid aggregate + one per-stream window — two
    shuffles on the stream key."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select(F.col(type_col).alias("_ty"),
                        F.floor(us / 3_600_000_000).alias("h"))
    counts = hrs.groupBy("_ty", "h").agg(F.count("*").alias("c"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (counts.select("_ty").distinct()
            .crossJoin(F.broadcast(span))
            .select("_ty", F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(counts, ["_ty", "h"], "left")
            .select("_ty", "h", F.coalesce("c", F.lit(0)).alias("c")))
    wl = W.partitionBy("_ty").orderBy("h")
    lagged = (grid.withColumn("_s", F.lag("c", season).over(wl))
              .withColumn("_p", F.lag("c", 1).over(wl))
              .filter(F.col("_s").isNotNull()))
    agg = lagged.groupBy("_ty").agg(
        F.count("*").alias("n_hours_eval"),
        F.sum(F.abs(F.col("c") - F.col("_s"))).alias("_es"),
        F.sum(F.abs(F.col("c") - F.col("_p"))).alias("_e1"))
    mae_s = F.col("_es").cast("double") / F.col("n_hours_eval")
    mae_1 = F.col("_e1").cast("double") / F.col("n_hours_eval")
    return (agg.filter(F.col("_e1") > 0)
            .select(F.col("_ty").alias(type_col),
                    F.col("n_hours_eval").cast("long")
                    .alias("n_hours_eval"),
                    F.round(mae_s, 6).alias("mae_seasonal"),
                    F.round(mae_1, 6).alias("mae_naive1"),
                    F.round(F.col("_es").cast("double") / F.col("_e1"), 6)
                    .alias("mase")))


def rfm_segments(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 n_tiles: int = 3) -> DataFrame:
    """RFM segmentation: per user Recency (days between the user's
    last event and the corpus end), Frequency (event count) and
    Monetary (exact cent sum of ``value``), each scored into
    ``n_tiles`` quantile tiles, reported per (r, f, m) segment — the
    classic marketing/cohort cut, and the grouping key quality
    pipelines stratify engagement-weighted sampling on.

    Determinism: monetary sums as round(value·100) int64 cents (never
    float accumulation); the tile assignment is ntile over a TOTAL
    order (metric, user_id), so ties split identically in both
    engines. Scores follow the convention "1 = best": recency ASC
    (most recent first), frequency/monetary DESC (highest first).
    Plan: one corpus shuffle (per-user aggregate), three tile windows
    over the per-user table partitioned by a non-foldable constant
    key (users ≪ events; the corpus-sized work is the aggregate),
    one segment aggregate."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    per_user = (events.groupBy(user_col).agg(
        F.max(us).alias("_last"),
        F.count("*").alias("freq"),
        F.sum(cents).alias("cents")))
    gend = per_user.agg(F.max("_last").alias("_end"))
    pu = (per_user.crossJoin(F.broadcast(gend))
          .withColumn("rec_days", F.floor(
              (F.col("_end") - F.col("_last")) / 86_400_000_000)
              .cast("long")))
    pk = F.col("freq") % F.lit(1)     # non-foldable always-0 key
    r_w = W.partitionBy(pk).orderBy(F.col("rec_days").asc(),
                                    F.col(user_col).asc())
    f_w = W.partitionBy(pk).orderBy(F.col("freq").desc(),
                                    F.col(user_col).asc())
    m_w = W.partitionBy(pk).orderBy(F.col("cents").desc(),
                                    F.col(user_col).asc())
    scored = (pu.withColumn("r", F.ntile(n_tiles).over(r_w))
              .withColumn("f", F.ntile(n_tiles).over(f_w))
              .withColumn("m", F.ntile(n_tiles).over(m_w)))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count("*").cast("long").alias("n_users"),
                 F.sum("cents").cast("long").alias("total_cents"),
                 # explicit exact-int sum / count, not AVG: engines
                 # differ in AVG's internal accumulator type
                 F.round(F.sum("freq") / F.count("*"), 6)
                 .alias("avg_events")))


def markov_transitions(events: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type") -> DataFrame:
    """First-order Markov transition table between event types: for
    each consecutive in-user pair (ordered by ts, event_id), the count
    and the row-normalized transition probability P(to | from) — the
    behavioral model behind next-event prediction baselines and the
    sanity check sequence-generating simulators are tuned against.

    Exact integer counts; the probability is one division rounded
    6dp. Plan: ONE corpus shuffle (the per-user lag window), then
    bounded aggregates (|types|² rows)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wu = W.partitionBy(user_col).orderBy(us, "event_id")
    pairs = (events
             .withColumn("_next", F.lead(type_col).over(wu))
             .filter(F.col("_next").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("_next").alias("to_type"))
             .agg(F.count("*").alias("n")))
    wout = W.partitionBy("from_type")
    return (pairs
            .withColumn("_out", F.sum("n").over(wout))
            .select("from_type", "to_type",
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("n") / F.col("_out"), 6).alias("p")))


#: Benford expected leading-digit probabilities log10(1 + 1/d),
#: precomputed as 6dp literals so no runtime libm crosses the engine
#: boundary (the x141 Fellegi–Sunter convention).
BENFORD_P = [0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
             0.066947, 0.057992, 0.051153, 0.045757]


def benford_deviation(events: DataFrame, group_col: str = "event_type",
                      value_col: str = "value") -> DataFrame:
    """Leading-digit (Benford's law) audit per group: observed
    leading-digit counts of positive ``value``s vs the Benford
    expectation, with each digit's chi-square contribution — the
    fabricated-data / instrumentation-bug sniff for metric columns.

    The leading digit comes from the DECIMAL STRING of the exact cent
    value (first character of CAST(round(value·100) AS BIGINT)), not
    from log10 — zero libm, so digit assignment is bit-identical in
    both engines. Bounded output: |groups| · 9 rows."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (events.filter(cents > 0)
              .groupBy(F.col(group_col).alias("grp"),
                       digit.alias("digit"))
              .agg(F.count("*").alias("n")))
    wg = W.partitionBy("grp")
    pmap = F.element_at(F.array(*[F.lit(p) for p in BENFORD_P]),
                        F.col("digit"))
    exp = F.col("_tot") * pmap
    return (counts
            .withColumn("_tot", F.sum("n").over(wg))
            .select(F.col("grp").alias(group_col), "digit",
                    F.col("n").cast("long").alias("observed"),
                    F.round(exp, 6).alias("expected"),
                    F.round((F.col("n") - exp) * (F.col("n") - exp)
                            / exp, 6).alias("chi2_contrib")))


def active_users(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", week: int = 7,
                 month: int = 28) -> DataFrame:
    """DAU/WAU/MAU engagement census: for every calendar day in the
    corpus span, the distinct users active that day, in the trailing
    ``week`` days, and in the trailing ``month`` days, plus the
    DAU/MAU "stickiness" ratio — the growth-accounting table every
    event pipeline publishes first.

    The trailing-window distinct counts are computed by EXPLODING each
    distinct (day, user) pair into the ``w`` future days it
    contributes to, then one distinct-aggregate per day — a linear
    map-side fan-out (×7 + ×28) instead of a day×user-day range join,
    so the shuffle stays proportional to user-days and partial
    aggregation dedups map-side. Days with zero activity still appear
    (densified grid), with dau 0 and NULL stickiness when mau is 0."""
    day = F.to_date(F.col(ts_col))
    ud = (events.select(day.alias("d"),
                        F.col(user_col).alias("u")).distinct()
          # four consumers: bounds, dau, and the two trailing explodes
          .localCheckpoint(eager=False))
    bounds = ud.agg(F.min("d").alias("_mn"), F.max("d").alias("_mx"))
    grid = (bounds.select(F.explode(F.sequence(
        F.col("_mn"), F.col("_mx"))).alias("day")))

    def trailing(w: int, name: str) -> DataFrame:
        contrib = ud.select(
            F.explode(F.sequence(
                F.col("d"), F.date_add(F.col("d"), w - 1))).alias("day"),
            "u")
        return (contrib.join(grid.hint("broadcast"), "day")
                .groupBy("day")
                .agg(F.count_distinct("u").alias(name)))

    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count_distinct("u").alias("dau"))
    out = (grid.join(dau, "day", "left")
           .join(trailing(week, "wau"), "day", "left")
           .join(trailing(month, "mau"), "day", "left")
           .select("day",
                   F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
                   F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
                   F.coalesce("mau", F.lit(0)).cast("long").alias("mau")))
    stick = F.when(F.col("mau") > 0,
                   F.round(F.col("dau") / F.col("mau"), 6))
    return out.withColumn("stickiness", stick)


def power_user_curve(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", window_days: int = 28) -> DataFrame:
    """The L28 power-user curve: over the trailing ``window_days``
    ending at the corpus max day, the distribution of active-days per
    user — (active_days, n_users, pct_users). A healthy habit product
    is right-heavy; a smile curve means a split population. Bounded
    output (≤ window_days rows); two shuffles (user-day distinct +
    the per-user count)."""
    day = F.to_date(F.col(ts_col))
    ud = events.select(day.alias("d"),
                       F.col(user_col).alias("u")).distinct()
    end = ud.agg(F.max("d").alias("_mx"))
    win = (ud.join(end.hint("broadcast"))
           .filter(F.col("d") >= F.date_sub(F.col("_mx"),
                                            window_days - 1)))
    per_user = win.groupBy("u").agg(F.count("*").alias("active_days"))
    tot = per_user.agg(F.count("*").alias("_nu"))
    return (per_user.groupBy("active_days")
            .agg(F.count("*").alias("n_users"))
            .join(tot.hint("broadcast"))
            .select(F.col("active_days").cast("long").alias("active_days"),
                    F.col("n_users").cast("long").alias("n_users"),
                    F.round(F.col("n_users") / F.col("_nu"), 6)
                    .alias("pct_users")))


def basket_lift(lineitem: DataFrame, basket_col: str = "l_orderkey",
                item: F.Column | None = None,
                min_count: int = 10) -> DataFrame:
    """Market-basket association rules over order co-occurrence:
    support / directional confidence / lift for every item pair
    appearing in ≥ ``min_count`` shared baskets. ``item`` defaults to
    the part-category proxy l_partkey % 100 so the co-occurrence
    matrix is dense enough to rank.

    Plan: distinct (basket, item) → self-join ON basket (the shuffle
    keys both sides by basket; per-basket fan-out is bounded by
    basket size, never all-pairs) → bounded |items|² aggregate; the
    per-item margins and the basket total broadcast back onto it."""
    item = item if item is not None else (F.col("l_partkey") % 100)
    bi = (lineitem.select(F.col(basket_col).alias("b"),
                          item.cast("long").alias("i"))
          .distinct()
          # four consumers: both pair sides, margins, basket total
          .localCheckpoint(eager=False))
    n_baskets = bi.select("b").distinct().agg(
        F.count("*").alias("_nb"))
    margins = bi.groupBy("i").agg(F.count("*").alias("_ni"))
    a, c = bi.alias("a"), bi.alias("c")
    pairs = (a.join(c, (F.col("a.b") == F.col("c.b"))
                    & (F.col("a.i") < F.col("c.i")))
             .groupBy(F.col("a.i").alias("item_a"),
                      F.col("c.i").alias("item_b"))
             .agg(F.count("*").alias("n_ab"))
             .filter(F.col("n_ab") >= min_count))
    ma = margins.select(F.col("i").alias("item_a"),
                        F.col("_ni").alias("_na"))
    mb = margins.select(F.col("i").alias("item_b"),
                        F.col("_ni").alias("_nb_item"))
    return (pairs.join(ma.hint("broadcast"), "item_a")
            .join(mb.hint("broadcast"), "item_b")
            .join(n_baskets.hint("broadcast"))
            .select("item_a", "item_b",
                    F.col("n_ab").cast("long").alias("n_ab"),
                    F.round(F.col("n_ab") / F.col("_nb"), 6)
                    .alias("support"),
                    F.round(F.col("n_ab") / F.col("_na"), 6)
                    .alias("conf_a_to_b"),
                    F.round(F.col("n_ab") / F.col("_nb_item"), 6)
                    .alias("conf_b_to_a"),
                    F.round(F.col("n_ab") * F.col("_nb")
                            / (F.col("_na") * F.col("_nb_item")), 6)
                    .alias("lift")))


def welch_ttest(events: DataFrame, arm: F.Column | None = None,
                value_col: str = "value") -> DataFrame:
    """Welch's unequal-variance t-test between two arms (default
    user_id % 2) on exact cent values: one row with per-arm n / mean,
    the t statistic and the Welch–Satterthwaite degrees of freedom —
    the A/B significance primitive next to x153's SRM gate and x154's
    stratified uplift.

    Moments accumulate exactly (cent sums as int64; the squared
    moment as decimal(38,0), the x163/auc_rank overflow discipline —
    int64 Σc² throws ARITHMETIC_OVERFLOW under ANSI at large SF), so
    the means/variances are single division chains over exact values
    — engine-identical at 6dp. Degenerate guards: a 1-row arm has
    undefined variance (n−1 = 0) and two zero-variance arms have an
    undefined t — both yield NULL t/df, never ±∞/NaN (the
    kaplan-meier ln(0) divergence class). ONE map-side-combined
    aggregate, one 1-row result."""
    arm = arm if arm is not None else (F.col("user_id") % 2)
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    g = (events.select(arm.cast("int").alias("g"), cents.alias("c"))
         .groupBy("g")
         .agg(F.count("*").alias("n"), F.sum("c").alias("s"),
              F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
              .alias("ss"))
         # both arm slices read this 2-row frame
         .localCheckpoint(eager=False))
    a = g.filter(F.col("g") == 0).alias("a")
    b = g.filter(F.col("g") == 1).alias("b")
    row = a.join(b.hint("broadcast"))

    def mean(side):
        return F.col(f"{side}.s") / F.col(f"{side}.n")

    def var(side):
        # s cast to double BEFORE the square (oracle: s * 1.0 * s):
        # the int64 product overflows; the double product of an
        # exactly-representable s is correctly rounded to the same
        # double as the exact integer square.
        return ((F.col(f"{side}.ss").cast("double")
                 - F.col(f"{side}.s").cast("double")
                 * F.col(f"{side}.s") / F.col(f"{side}.n"))
                / (F.col(f"{side}.n") - 1))

    ok = (F.col("a.n") > 1) & (F.col("b.n") > 1)
    se0 = var("a") / F.col("a.n")
    se1 = var("b") / F.col("b.n")
    t = F.when(ok & ((se0 + se1) > 0),
               (mean("a") - mean("b")) / F.sqrt(se0 + se1))
    df = F.when(ok & ((se0 + se1) > 0),
                (se0 + se1) * (se0 + se1)
                / (se0 * se0 / (F.col("a.n") - 1)
                   + se1 * se1 / (F.col("b.n") - 1)))
    return row.select(
        F.col("a.n").cast("long").alias("n0"),
        F.col("b.n").cast("long").alias("n1"),
        F.round(mean("a"), 6).alias("mean_cents_0"),
        F.round(mean("b"), 6).alias("mean_cents_1"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"))


def cuped_adjustment(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value",
                     split_days: int = 15) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): per user, the
    pre-period cent total (first ``split_days`` days) is the
    covariate X, the experiment-period total is the metric Y;
    θ = cov(X,Y)/var(X) over ALL users, and each arm (user parity)
    reports its raw and adjusted means plus the variance ratio
    var(Y − θX)/var(Y) — the standard sensitivity boost for A/B
    metrics with a correlated pre-period.

    All moments are exact: ΣX/ΣY as int64 cent sums, the squared and
    cross moments (ΣXY, ΣX², ΣY²) as decimal(38,0) — the x163
    overflow discipline (int64 Σx² throws ARITHMETIC_OVERFLOW under
    ANSI at large SF). θ and every output is a division chain over
    them, engine-exact at 6dp. Degenerate guards: zero pre-period
    variance leaves θ undefined (NULL θ/adjusted columns) and a
    1-user arm has undefined var(Y) (NULL var_ratio) — never a
    divide-by-zero. Two shuffles (per-user aggregate; per-arm
    rollup)."""
    day = F.to_date(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    start = events.agg(F.min(day).alias("_d0"))
    per_user = (events.join(start.hint("broadcast"))
                .groupBy(F.col(user_col).alias("u"))
                .agg(F.sum(F.when(F.datediff(day, F.col("_d0"))
                                  < split_days, cents).otherwise(0))
                     .alias("x"),
                     F.sum(F.when(F.datediff(day, F.col("_d0"))
                                  >= split_days, cents).otherwise(0))
                     .alias("y"))
                # the global-θ and per-arm rollups both read it
                .localCheckpoint(eager=False))
    dx = F.col("x").cast("decimal(38,0)")
    glob = per_user.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dx * F.col("y")).alias("sxy"))
    # cast before the cross products: Σx·Σy of int64 cent sums
    # overflows long at large SF (the x159 discipline)
    var_x = (F.col("sxx").cast("double")
             - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
    theta = F.when(
        var_x != 0,
        (F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
        / var_x)
    xbar = F.col("sx") / F.col("n")
    arms = (per_user.withColumn("arm", (F.col("u") % 2).cast("int"))
            .groupBy("arm")
            .agg(F.count("*").alias("na"), F.sum("x").alias("ax"),
                 F.sum("y").alias("ay"),
                 F.sum(dx * F.col("x")).alias("axx"),
                 F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
                 .alias("ayy"),
                 F.sum(dx * F.col("y")).alias("axy")))
    j = arms.join(glob.hint("broadcast"))
    mean_y = F.col("ay") / F.col("na")
    mean_adj = mean_y - theta * (F.col("ax") / F.col("na") - xbar)
    # NULL (not 0/0) when the arm has a single user: the n−1 division
    # is gated, so var_ratio below sees NULL and propagates it
    var_y = F.when(
        F.col("na") > 1,
        (F.col("ayy").cast("double")
         - F.col("ay").cast("double") * F.col("ay") / F.col("na"))
        / (F.col("na") - 1))
    # var(Y − θX) expanded over the same exact moments
    var_adj = ((F.col("ayy").cast("double")
                - 2 * theta * F.col("axy").cast("double")
                + theta * theta * F.col("axx").cast("double")
                - (F.col("ay") - theta * F.col("ax"))
                * (F.col("ay") - theta * F.col("ax")) / F.col("na"))
               / (F.col("na") - 1))
    return j.select(
        "arm", F.col("na").cast("long").alias("n_users"),
        F.round(theta, 6).alias("theta"),
        F.round(mean_y, 6).alias("mean_cents"),
        F.round(mean_adj, 6).alias("mean_cents_adj"),
        F.round(F.when(var_y > 0, var_adj / var_y), 6)
        .alias("var_ratio"))


def emd_drift(events: DataFrame, type_col: str = "event_type",
              ts_col: str = "ts") -> DataFrame:
    """Hour-of-day distribution drift as 1-D Wasserstein-1 (earth
    mover's) distance between each event stream and the whole corpus:
    EMD = Σ_h |CDF_type(h) − CDF_all(h)| over the 24 hourly bins —
    the magnitude-aware companion to the PSI (x138) / JSD (x147) /
    KS (x96) drift gates (EMD sees HOW FAR mass moved, not just that
    it moved).

    Counts are exact ints; each CDF is an exact-ratio double and the
    24-term sum happens per group after 6dp-stable arithmetic.
    Bounded: |types|·24 intermediate rows."""
    hour = F.hour(F.col(ts_col)).alias("h")
    per = (events.groupBy(F.col(type_col).alias("ty"), hour)
           .agg(F.count("*").alias("c")))
    # densify the 24-hour grid per type so CDFs align bin-for-bin
    types = per.select("ty").distinct()
    grid = types.crossJoin(
        F.broadcast(events.sparkSession.range(24)
                    .select(F.col("id").cast("int").alias("h"))))
    dense = (grid.join(per, ["ty", "h"], "left")
             .select("ty", "h", F.coalesce("c", F.lit(0)).alias("c"))
             .localCheckpoint(eager=False))  # |types|·24 rows, read 2x
    wt = W.partitionBy("ty").orderBy("h") \
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = dense.withColumn("_cum", F.sum("c").over(wt)) \
        .withColumn("_tot", F.sum("c").over(W.partitionBy("ty")))
    # corpus-wide CDF over the same grid (24 rows; the h % 1 key is a
    # non-foldable always-0 partition, the repo's WindowExec invariant)
    allc = (dense.groupBy("h").agg(F.sum("c").alias("ca")))
    cuma = (allc.withColumn("_cuma", F.sum("ca").over(
        W.partitionBy(F.col("h") % F.lit(1)).orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .withColumn("_tota", F.sum("ca").over(
            W.partitionBy(F.col("h") % F.lit(1)))))
    j = cum.join(cuma.select("h", "_cuma", "_tota").hint("broadcast"), "h")
    term = F.abs(F.col("_cum") / F.col("_tot")
                 - F.col("_cuma") / F.col("_tota"))
    return (j.groupBy(F.col("ty").alias(type_col))
            .agg(F.max("_tot").cast("long").alias("n_events"),
                 F.round(F.sum(term), 6).alias("emd")))


def holt_forecast(events: DataFrame, type_col: str = "event_type",
                  ts_col: str = "ts", alpha_q: float = 0.2,
                  beta_q: float = 0.1) -> DataFrame:
    """Holt linear (double) exponential smoothing per event stream
    over densified hourly counts — the level+trend forecaster one rung
    above e36's seasonal-naïve floor. Per stream: the smoothed final
    level and trend, the one-step-ahead forecast, and the in-sample
    one-step MAE (each step's |y_t − (l+b)| BEFORE updating). The
    trend seed b0 = y2 − y1 makes the FIRST fold step's error
    structurally zero (pred = y1 + (y2−y1) = y2), so the MAE divides
    the error sum by n−2 — the count of genuinely predictive steps —
    and is NULL for n ≤ 2 (no predictive step exists).

    The recurrence (l' = α·y + (1−α)(l+b); b' = β(l'−l) + (1−β)b) is
    inherently sequential, so it folds ENGINE-SIDE over each stream's
    collected hour series (bounded: the corpus hour span) via
    F.aggregate — the e29/x156 fold discipline — with the state
    quantized to 1e-9 fixed-point after EVERY step so a last-ulp
    disagreement cannot compound across the fold. State is the
    3-vector [level, trend, abs-err-sum]; elements enter as [y, 0, 0]
    so the DuckDB mirror can fold the same-typed list with the
    initial state prepended (list_reduce has no separate seed type).
    Plan: one grouped count, one bounded per-stream collect, map-side
    fold — two shuffles."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select(F.col(type_col).alias("_ty"),
                        F.floor(us / 3_600_000_000).alias("h"))
    counts = hrs.groupBy("_ty", "h").agg(F.count("*").alias("c"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (counts.select("_ty").distinct()
            .crossJoin(F.broadcast(span))
            .select("_ty", F.explode(F.sequence("h0", "h1")).alias("h"))
            .join(counts, ["_ty", "h"], "left")
            .select("_ty", "h",
                    F.coalesce("c", F.lit(0)).cast("double").alias("c")))
    ser = (grid.groupBy("_ty")
           .agg(F.array_sort(F.collect_list(F.struct("h", "c")))
                .alias("_s")))
    ys = F.transform(F.col("_s"), lambda s: s["c"])
    n = F.size(ys)

    def q9(x):
        return F.floor(x * 1e9 + F.lit(0.5)) / 1e9

    a, b = F.lit(alpha_q), F.lit(beta_q)
    init = F.array(F.element_at(ys, 1),
                   q9(F.element_at(ys, 2) - F.element_at(ys, 1)),
                   F.lit(0.0))

    def step(acc, y):
        l_prev, b_prev, e_prev = acc[0], acc[1], acc[2]
        pred = l_prev + b_prev
        err = q9(e_prev + F.abs(y - pred))
        l_new = q9(a * y + (F.lit(1.0) - a) * pred)
        b_new = q9(b * (l_new - l_prev) + (F.lit(1.0) - b) * b_prev)
        return F.array(l_new, b_new, err)

    folded = F.aggregate(F.slice(ys, 2, F.greatest(n - 1, F.lit(0))),
                         init, step)
    out = (ser.filter(n >= 2)
           .withColumn("_f", folded))
    return out.select(
        F.col("_ty").alias(type_col),
        n.cast("long").alias("n_hours"),
        F.round(F.element_at("_f", 1), 6).alias("level"),
        F.round(F.element_at("_f", 2), 6).alias("trend"),
        F.round(F.element_at("_f", 1) + F.element_at("_f", 2), 6)
        .alias("forecast_next"),
        F.round(F.when(n > 2, F.element_at("_f", 3) / (n - 2)), 6)
        .alias("mae_1step"))


def mann_kendall(events: DataFrame, type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Mann–Kendall trend test per event stream over densified hourly
    counts: S = Σ_{i<j} sign(c_j − c_i), the tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    continuity-corrected z — the nonparametric is-there-a-trend gate
    that pairs with x122's Theil–Sen slope (how steep) and e34's CUSUM
    (where it broke).

    S and both variance terms are exact int64; z is one division over
    a correctly-rounded sqrt — engine-identical at 6dp. The pair
    self-join is bounded by the HOUR-GRID size squared (time span,
    not corpus size), keyed per stream."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select(F.col(type_col).alias("_ty"),
                        F.floor(us / 3_600_000_000).alias("h"))
    counts = hrs.groupBy("_ty", "h").agg(F.count("*").alias("c"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (counts.select("_ty").distinct()
             .crossJoin(F.broadcast(span))
             .select("_ty", F.explode(F.sequence("h0", "h1")).alias("h"))
             .join(counts, ["_ty", "h"], "left")
             .select("_ty", "h", F.coalesce("c", F.lit(0)).alias("c"))
             .localCheckpoint(eager=False))   # pair sides + tie census
    a, b = dense.alias("a"), dense.alias("b")
    s = (a.join(b, (F.col("a._ty") == F.col("b._ty"))
                & (F.col("a.h") < F.col("b.h")))
         .groupBy(F.col("a._ty").alias("_ty"))
         .agg(F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
              .alias("s_stat"),
              (F.count("*")).alias("_pairs")))
    ties = (dense.groupBy("_ty", "c").agg(F.count("*").alias("t"))
            .groupBy("_ty")
            .agg(F.sum("t").alias("n"),
                 F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("_tt")))
    j = s.join(ties, "_ty")
    var_s = ((F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
              - F.col("_tt")) / 18)
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(var_s))
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1) / F.sqrt(var_s))
         .otherwise(F.lit(0.0)))
    return j.select(F.col("_ty").alias(type_col),
                    F.col("n").cast("long").alias("n_hours"),
                    F.col("s_stat").cast("long").alias("s_stat"),
                    F.round(var_s, 6).alias("var_s"),
                    F.round(z, 6).alias("z"))


def qte_deciles(events: DataFrame, user_col: str = "user_id",
                value_col: str = "value") -> DataFrame:
    """Quantile treatment effects: at each decile, the EXACT order
    statistic of per-user cent totals in the treatment arm minus the
    control arm — where the mean-based x159/x165 view hides
    distributional shifts (a heavy-tail gain with a median loss nets
    to zero in a t-test; it can't here).

    Ranks are type-1 order statistics at ceil(q·n/100) computed in
    pure int arithmetic; every output is an int64 cent value or an
    int difference — bit-exact across engines, no rounding at all.
    Plan: per-user aggregate, one rank window per arm, a 9-row decile
    grid join."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    pu = (events.groupBy(F.col(user_col).alias("u"))
          .agg(F.sum(cents).alias("c"))
          .withColumn("arm", (F.col("u") % 2).cast("int")))
    wr = W.partitionBy("arm").orderBy(F.col("c").asc(), F.col("u").asc())
    ranked = (pu.withColumn("_r", F.row_number().over(wr))
              .withColumn("_n", F.count("*").over(W.partitionBy("arm"))))
    qs = events.sparkSession.range(1, 10).select(
        (F.col("id") * 10).cast("int").alias("decile"))
    # rank = ceil(q·n/100) in int arithmetic
    picked = (ranked.join(F.broadcast(qs))
              .filter(F.col("_r") == F.floor(
                  (F.col("decile") * F.col("_n") + 99) / 100))
              .select("decile", "arm", "c")
              # 18 rows, read by both arm slices — keeps the rank
              # window from running twice
              .localCheckpoint(eager=False))
    t = picked.filter(F.col("arm") == 1).select(
        "decile", F.col("c").alias("q_treat"))
    c = picked.filter(F.col("arm") == 0).select(
        "decile", F.col("c").alias("q_control"))
    return (t.join(c, "decile")
            .select(F.col("decile").cast("int").alias("decile"),
                    F.col("q_treat").cast("long").alias("q_treat_cents"),
                    F.col("q_control").cast("long")
                    .alias("q_control_cents"),
                    (F.col("q_treat") - F.col("q_control")).cast("long")
                    .alias("qte_cents")))


def nb_dispersion(events: DataFrame, type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Overdispersion audit per event stream: mean/variance of the
    densified hourly counts, the dispersion index var/mean (Poisson
    ⇒ 1), and the method-of-moments negative-binomial fit
    (p = m/v, r = m²/(v−m), defined only when v > m) — the
    count-model sanity check behind rate alerting and synthetic-load
    generators.

    Moments are exact int64 (counts squared summed); every output is
    a division chain over them, 6dp. Two bounded shuffles."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    hrs = events.select(F.col(type_col).alias("_ty"),
                        F.floor(us / 3_600_000_000).alias("h"))
    counts = hrs.groupBy("_ty", "h").agg(F.count("*").alias("c"))
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    dense = (counts.select("_ty").distinct()
             .crossJoin(F.broadcast(span))
             .select("_ty", F.explode(F.sequence("h0", "h1")).alias("h"))
             .join(counts, ["_ty", "h"], "left")
             .select("_ty", F.coalesce("c", F.lit(0)).alias("c")))
    m = (dense.groupBy("_ty")
         .agg(F.count("*").alias("n"), F.sum("c").alias("s"),
              F.sum(F.col("c") * F.col("c")).alias("ss")))
    mean = F.col("s") / F.col("n")
    var = ((F.col("ss") - F.col("s").cast("double") * F.col("s")
            / F.col("n")) / (F.col("n") - 1))
    over = var > mean
    return m.select(
        F.col("_ty").alias(type_col),
        F.col("n").cast("long").alias("n_hours"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var, 6).alias("var_per_hour"),
        F.round(var / mean, 6).alias("dispersion_index"),
        F.when(over, F.round(mean / var, 6)).alias("nb_p"),
        F.when(over, F.round(mean * mean / (var - mean), 6))
        .alias("nb_r"))


def diff_in_diff(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 split_days: int = 15) -> DataFrame:
    """Difference-in-differences: per-user cent totals in the pre
    (first ``split_days`` days) and post periods, averaged per arm
    (user parity); DiD = (treat_post − treat_pre) − (control_post −
    control_pre) — the causal-effect workhorse when assignment isn't
    randomized, completing the experimentation battery (x153 SRM →
    x159 Welch → x165 CUPED → x167 QTE → this).

    Exact int64 cent sums; all four cell means and the DiD are
    division chains over them, 6dp. One row."""
    day = F.to_date(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    start = events.agg(F.min(day).alias("_d0"))
    pu = (events.join(start.hint("broadcast"))
          .groupBy(F.col(user_col).alias("u"))
          .agg(F.sum(F.when(F.datediff(day, F.col("_d0")) < split_days,
                            cents).otherwise(0)).alias("pre"),
               F.sum(F.when(F.datediff(day, F.col("_d0")) >= split_days,
                            cents).otherwise(0)).alias("post")))
    g = (pu.withColumn("arm", (F.col("u") % 2).cast("int"))
         .groupBy("arm")
         .agg(F.count("*").alias("n"), F.sum("pre").alias("sp"),
              F.sum("post").alias("so"))
         # both arm slices read this 2-row frame — without the
         # checkpoint the whole per-user subtree duplicates
         .localCheckpoint(eager=False))
    t = g.filter(F.col("arm") == 1).alias("t")
    c = g.filter(F.col("arm") == 0).alias("c")
    row = t.join(c.hint("broadcast"))

    def mean(side, col):
        return F.col(f"{side}.{col}") / F.col(f"{side}.n")

    did = ((mean("t", "so") - mean("t", "sp"))
           - (mean("c", "so") - mean("c", "sp")))
    return row.select(
        F.col("t.n").cast("long").alias("n_treat"),
        F.col("c.n").cast("long").alias("n_control"),
        F.round(mean("t", "sp"), 6).alias("treat_pre"),
        F.round(mean("t", "so"), 6).alias("treat_post"),
        F.round(mean("c", "sp"), 6).alias("control_pre"),
        F.round(mean("c", "so"), 6).alias("control_post"),
        F.round(did, 6).alias("did_cents"))
