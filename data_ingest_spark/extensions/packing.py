"""Sequence packing and weighted corpus mixing for pretraining.

``pack_sequences`` assigns documents to fixed-token-budget training
sequences by contiguous packing: order the corpus deterministically,
take the running token total, and cut a new sequence every ``budget``
tokens (documents may straddle a cut — exactly how pretraining packs
token streams; the bin id is the sequence a document *starts* in).

The global running sum is the distributed-prefix-sum pattern (same as
windows.dense_ids_scalable / ntile_scalable): partition the order key
into coarse ranges, window-sum within each range in parallel, then
shift every range by the collected per-range token totals — one small
driver-side prefix sum, never a single-task global window.

``weighted_mix`` resamples a corpus to target source weights with
content-addressed Bernoulli draws (seeded md5 bucket < weight·10⁴):
deterministic, layout-independent, one codegen filter — the standard
way to hit a data-mixing recipe without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from data_ingest_spark.extensions.sampling import BUCKETS, hash_bucket


def pack_sequences(df: DataFrame, budget: int,
                   order_col: str = "doc_id",
                   token_col: str = "n_tokens",
                   coarse_ranges: int = 32,
                   out_col: str = "seq_id") -> DataFrame:
    """Add ``seq_id``: the 0-based training sequence this row starts
    in, under contiguous packing at ``budget`` tokens per sequence.
    Ordering is by ``order_col`` (must be unique)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    # Monotone coarse split of the order-key domain via approximate
    # quantile boundaries. The split only controls PARALLELISM: any
    # monotone bucketing yields the same seq_ids (ranks and offsets
    # compose to the same global running sum), so the quantile
    # sketch's wobble cannot change the result.
    #
    # FULLY LAZY (round 7): the previous build ran TWO eager driver
    # actions — df.approxQuantile for the bounds and a collect() for
    # the per-range offsets — each of which executed the caller's
    # ENTIRE upstream plan; with p4's gate→dedup→count chain as input
    # the pipeline ran three times per materialization. The bounds
    # are now a lazy percentile_approx aggregate broadcast back as an
    # array column, the offsets a cumulative-sum window over the
    # one-row-per-range totals, and the bucketed frame localCheckpoints
    # (lazily) so the range aggregate and the ranking window share one
    # materialization of the upstream instead of re-deriving it.
    probs = F.array(*[F.lit(i / coarse_ranges)
                      for i in range(1, coarse_ranges)])
    bounds = df.agg(F.percentile_approx(
        F.col(order_col).cast("double"), probs, F.lit(1000))
        .alias("_bounds"))
    oc = F.col(order_col).cast("double")
    rng = F.size(F.filter(
        F.coalesce(F.col("_bounds"),
                   F.array().cast("array<double>")),
        lambda b: oc > b))
    d = (df.crossJoin(F.broadcast(bounds))
         .withColumn("_rng", rng.cast("int")).drop("_bounds")
         .localCheckpoint(eager=False))
    totals = d.groupBy("_rng").agg(F.sum(token_col).alias("_t"))
    # one row per range — the cumsum window is tiny; _t % 1 is a
    # non-foldable always-0 partition key (repo invariant: no
    # unpartitioned WindowExec)
    woff = (W.partitionBy(F.col("_t") % F.lit(1)).orderBy("_rng")
            .rowsBetween(W.unboundedPreceding, -1))
    offs = totals.select(
        "_rng", F.coalesce(F.sum("_t").over(woff),
                           F.lit(0).cast("long")).alias("_off"))
    w = (W.partitionBy("_rng").orderBy(order_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = F.sum(token_col).over(w) + F.col("_off")
    start = run - F.col(token_col)          # tokens before this doc
    cols = df.columns
    return (d.join(F.broadcast(offs), "_rng")
            .withColumn(out_col,
                        F.floor(start / F.lit(budget)).cast("long"))
            .select(*cols, out_col))


def weighted_mix(df: DataFrame, weights: dict[str, float],
                 strata_col: str = "source", id_col: str = "doc_id",
                 seed: int = 11) -> DataFrame:
    """Deterministically subsample each stratum to its target weight
    (fraction in [0, 1]; strata absent from ``weights`` are dropped)."""
    for k, v in weights.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"weight out of [0,1] for {k}")
    cut = F.create_map(*[F.lit(x) for k, v in weights.items()
                         for x in (k, int(round(v * BUCKETS)))])
    b = hash_bucket(F.col(id_col), seed)
    return df.filter(b < F.coalesce(cut[F.col(strata_col)], F.lit(0)))


def mix_quota(df: DataFrame, budget: int, source_col: str = "source",
              token_col: str = "n_tokens",
              id_col: str = "doc_id") -> DataFrame:
    """Apportion a global token budget equally across sources
    (largest-remainder rounding: base = budget div n_sources, the
    first budget mod n_sources sources in name order get one extra
    token) and keep each source's greedy prefix — documents ordered by
    (tokens desc, id asc), kept while the running total stays within
    the source's quota. Returns (source, doc_id, n_tokens, cum_tokens,
    quota).

    The Dolma/D4-style "hit the mixing recipe exactly" primitive:
    unlike ``weighted_mix`` (Bernoulli, hits weights in expectation)
    this is deterministic and exact to the token. Plan: the source
    list is a tiny distinct + broadcast; the per-source cumulative sum
    is one window partitioned by source — a single shuffle of the
    corpus, parallel across sources. Integer arithmetic throughout."""
    from data_ingest_spark.operators.windows import dense_ids_scalable
    srcs = (dense_ids_scalable(df.select(source_col).distinct(),
                               order=[source_col], id_col="_idx")
            .withColumn("_idx", F.col("_idx") + 1))
    n_src = srcs.groupBy().agg(F.count("*").alias("_n"))
    quota = (srcs.crossJoin(F.broadcast(n_src))
             .select(source_col,
                     F.expr(f"CAST({int(budget)} AS BIGINT) div _n")
                     .alias("_base"),
                     (F.lit(budget).cast("long") % F.col("_n")).alias("_ext"),
                     "_idx")
             .select(source_col,
                     (F.col("_base")
                      + F.when(F.col("_idx") <= F.col("_ext"), 1)
                      .otherwise(0)).cast("long").alias("quota")))
    wcum = (W.partitionBy(source_col)
            .orderBy(F.col(token_col).desc(), F.col(id_col).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (df.join(F.broadcast(quota), source_col)
            .withColumn("cum_tokens",
                        F.sum(token_col).over(wcum).cast("long"))
            .filter(F.col("cum_tokens") <= F.col("quota"))
            .select(source_col, id_col,
                    F.col(token_col).cast("long").alias(token_col),
                    "cum_tokens", "quota"))


def length_buckets(df: DataFrame, boundaries: list[int] | None = None,
                   token_col: str = "n_tokens") -> DataFrame:
    """Sequence-length bucketing for dynamic batching: assign each
    document to the smallest boundary bucket that holds it and report,
    per bucket, the document count, token total, pad target (the
    boundary, or the bucket max for the overflow bucket) and the
    padding waste a fixed-length batcher would pay. Returns
    ``(bucket, pad_target, n_docs, sum_tokens, waste_tokens,
    waste_frac)``.

    One grouped aggregation (exact integer math; the fraction divides
    two exact int64s). The standard pre-batching audit: pick
    boundaries so waste_frac stays low without fragmenting batches."""
    boundaries = boundaries or [64, 128, 256, 512]
    t = F.col(token_col)
    bucket = sum((t > F.lit(b)).cast("int") for b in boundaries)
    barr = F.array(*[F.lit(b).cast("long") for b in boundaries])
    agg = (df.withColumn("_b", bucket.cast("int"))
           .groupBy("_b")
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum(t).cast("long").alias("sum_tokens"),
                F.max(t).cast("long").alias("_mx")))
    pad = F.when(F.col("_b") < len(boundaries),
                 F.element_at(barr, F.col("_b") + 1)).otherwise(F.col("_mx"))
    return (agg.select(F.col("_b").alias("bucket"),
                       pad.cast("long").alias("pad_target"),
                       "n_docs", "sum_tokens")
            .withColumn("waste_tokens",
                        (F.col("pad_target") * F.col("n_docs")
                         - F.col("sum_tokens")).cast("long"))
            .withColumn("waste_frac",
                        F.round(F.col("waste_tokens")
                                / (F.col("pad_target") * F.col("n_docs")),
                                9)))


def temperature_mix(df: DataFrame, alpha: float = 0.3,
                    budget: int = 10000, source_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/multi-source
    alpha-sampling recipe: p_s ∝ n_s^alpha, alpha < 1 up-weights
    small sources): compute each source's sampling rate and its
    floor document quota out of ``budget``. Returns
    ``(source, n_docs, sample_rate, quota)``.

    Determinism: n_s^alpha is computed as exp(alpha·ln(n)) — the
    identical two-call libm sequence on both engines — then quantized
    to fixed-point int64 (floor(w·1e6 + 0.5)), so the normalizing sum
    is exact integer arithmetic and the quota is an exact integer
    ``(budget · w_fp) div total_fp``; only ``sample_rate`` divides
    (the same two int64s on each side → the same double).

    Plan shape: one grouped count over the corpus (map-side
    combined), then all arithmetic on the tiny per-source aggregate
    with the 1-row total broadcast back — a 100 TB corpus pays one
    shuffle of partial counts."""
    per = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    w_fp = F.floor(
        F.exp(F.lit(alpha) * F.log(F.col("n_docs").cast("double")))
        * 1000000.0 + F.lit(0.5)).cast("long")
    weighted = per.withColumn("_wfp", w_fp)
    tot = weighted.agg(F.sum("_wfp").alias("_tot"))
    return (weighted.crossJoin(F.broadcast(tot))
            .select(source_col,
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.round(F.col("_wfp") / F.col("_tot"), 6)
                    .alias("sample_rate"),
                    F.expr(f"(CAST({int(budget)} AS BIGINT) * _wfp) "
                           "div _tot").alias("quota")))
