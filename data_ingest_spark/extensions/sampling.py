"""Deterministic sampling and dataset splitting for training pipelines.

A 100 TB corpus cannot use ``df.sample`` for train/test assignment:
resampling must be reproducible across reruns, engines, and partition
layouts, and a document's split must never depend on which executor
saw it. The standard fix is content-addressed assignment — hash the
row's stable id with a seed and map the hash to a bucket in [0, 10000).
Everything here is a narrow projection (no shuffle, no UDF, pure
whole-stage-codegen expressions), so it streams at scan speed.

Cross-engine determinism (same bytes in Spark and DuckDB): bucket =
``int(md5(seed || ':' || id)[:7 hex], 16) % 10000``, the registry's
established md5-prefix idiom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int) -> Column:
    """Deterministic bucket in [0, BUCKETS) from a stable id."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))
              .cast("binary"))
    return (F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % BUCKETS)


def hash_bucket_sql(id_expr: str, seed: int) -> str:
    """The DuckDB-equivalent SQL expression (oracle twin)."""
    return (f"CAST(concat('0x', substr(md5('{seed}:' || "
            f"CAST({id_expr} AS VARCHAR)), 1, 7)) AS BIGINT) % {BUCKETS}")


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float],
               seed: int = 42, out_col: str = "split") -> DataFrame:
    """Assign each row a split label with the given weights.

    Weights need not sum to 1 — they are normalized. Assignment is a
    pure function of (seed, id): stable under reruns, repartitioning,
    and incremental data arrival (new rows never move old rows across
    splits).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    b = hash_bucket(F.col(id_col), seed)
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * BUCKETS
        cond = b < F.lit(int(round(acc)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, out)


def stratified_sample(df: DataFrame, id_col: str, fraction: float,
                      seed: int = 42) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id hash.

    Stratification comes for free: the hash is independent of every
    other column, so within any stratum the kept share converges to
    ``fraction``. Unlike ``df.sample`` the result is exactly
    reproducible and stable under repartitioning.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cut = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), seed) < F.lit(cut))


def stratified_quota(df: DataFrame, strata_col: str, k: int,
                     id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Exactly ``min(k, stratum size)`` rows per stratum, chosen by
    hash order — the deterministic 'k examples per source' primitive
    for eval-set construction. Selection is content-addressed (hash of
    the id, tie-broken by id), so the drawn set is stable across
    reruns and layouts; the per-stratum window parallelizes across
    strata (no global sort)."""
    from pyspark.sql import Window as W
    b = hash_bucket(F.col(id_col), seed)
    w = W.partitionBy(strata_col).orderBy(b.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def importance_sample(df: DataFrame, weight_col: str, id_col: str = "doc_id",
                      temperature: float = 1.0, seed: int = 21) -> DataFrame:
    """Quality-weighted corpus sampling: keep each row with
    probability ``weight^temperature`` (weight in [0, 1]), decided by
    the row's content-addressed hash bucket — the up/down-weighting
    step that turns a quality score into a training distribution.
    Higher temperature sharpens toward high-quality rows.

    Deterministic: keep ⟺ bucket(id) < floor(weight^T · BUCKETS); both
    factors are pure functions of the row, so the sample is stable
    across reruns, partitionings, and engines (exact oracle). Map-only
    — no shuffle, no RNG state."""
    cut = F.floor(F.pow(F.col(weight_col), F.lit(float(temperature)))
                  * BUCKETS)
    return df.filter(hash_bucket(F.col(id_col), seed) < cut)


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id", by: str = "source",
                    seed: int = 29) -> DataFrame:
    """Weighted sampling WITHOUT replacement: per ``by`` group, draw
    ``k`` rows with inclusion probability increasing in ``weight_col``
    — sequential Poisson sampling (Ohlsson 1998, the πps estimator
    family): priority = u / w with u ~ Uniform(0, 1], keep the k
    smallest priorities. The training-data use is quality-weighted
    subsampling of an oversized source without the with-replacement
    duplicates ``importance_sample`` style thinning can admit.

    Deterministic AND cross-engine exact: u = (bucket(id)+1)/BUCKETS is
    a ratio of integers and w is integral, so priority is two IEEE754
    correctly-rounded divisions — bit-identical in Spark and DuckDB
    (no libm transcendentals in the ordering). Ties (same bucket and
    weight) break on id. One shuffle (the per-group rank window)."""
    from pyspark.sql import Window as W

    u = ((hash_bucket(F.col(id_col), seed) + 1).cast("double")
         / F.lit(float(BUCKETS)))
    pri = u / F.col(weight_col).cast("double")
    ranked = df.withColumn("_pri", pri).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy(by).orderBy(F.col("_pri").asc(),
                                      F.col(id_col).asc())))
    return (ranked.filter(F.col("rank") <= k)
            .withColumn("priority", F.round("_pri", 9)).drop("_pri"))


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       weights: dict[str, float], id_col: str = "doc_id",
                       seed: int = 42,
                       out_col: str = "split") -> DataFrame:
    """Split assignment where every document connected by duplicate
    ``pairs`` (id_a, id_b) lands in the SAME split — the split is a
    pure function of the doc's duplicate-cluster representative
    (component-minimum id; docs in no pair represent themselves), so
    duplicated or near-duplicated content can never straddle
    train/test (the leakage mode a per-doc hash split permits).

    Composes :func:`data_ingest_spark.extensions.dedup.dup_clusters`
    (iterative small-star joins) with :func:`hash_split`; one extra
    left join versus the plain split. Output adds a ``rep`` column so
    the caller (and the oracle) can audit the cluster → split mapping.
    """
    from data_ingest_spark.extensions.dedup import dup_clusters

    clusters = dup_clusters(pairs)
    rep = (df.join(clusters.withColumnRenamed("doc_id", id_col),
                   id_col, "left")
           .withColumn("rep", F.coalesce("cluster", F.col(id_col)))
           .drop("cluster"))
    return hash_split(rep, "rep", weights, seed, out_col)


def epoch_shuffle(df: DataFrame, id_col: str = "doc_id", seed: int = 17,
                  num_shards: int = 8) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    0-based position in a pseudo-random permutation keyed by
    ``md5(seed:id)`` and a shard assignment ``pos % num_shards``
    (round-robin, so shard sizes differ by at most one and every
    shard samples the whole permutation uniformly).

    Per-epoch reshuffles are just a new seed — no data movement until
    the write. The global rank uses the distributed-prefix-sum
    pattern (windows.dense_ids_scalable): the first hash byte forms
    256 uniform coarse buckets, rows rank within their bucket in
    parallel, and a 256-row collected prefix sum shifts each bucket —
    never a single-task global sort, so the plan survives 100 TB.
    """
    from pyspark.sql import Window as W
    h = F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string")).cast("binary"))
    keyed = df.select(F.col(id_col), h.alias("_h")).withColumn(
        "_b", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int"))
    sizes = (keyed.groupBy("_b").agg(F.count("*").alias("n"))
             .orderBy("_b").collect())
    offsets, acc = {}, 0
    for r in sizes:
        offsets[r["_b"]] = acc
        acc += r["n"]
    if not offsets:  # empty input: an argless create_map() is
        # map<void,void> and fails analysis when indexed
        return keyed.select(F.col(id_col),
                            F.lit(0).cast("long").alias("pos"),
                            F.lit(0).cast("int").alias("shard"))
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = W.partitionBy("_b").orderBy("_h", id_col)
    return (keyed.withColumn("_local", F.row_number().over(w) - 1)
            .select(F.col(id_col),
                    (F.col("_local") + offmap[F.col("_b")]).cast("long")
                    .alias("pos"))
            .withColumn("shard",
                        (F.col("pos") % num_shards).cast("int")))


def temporal_split(df: DataFrame, cutoff: str, embargo_s: int = 0,
                   ts_col: str = "ts") -> DataFrame:
    """Time-based train/test split with an embargo gap: rows at or
    after ``cutoff`` are test, rows within ``embargo_s`` seconds
    before it are dropped into an 'embargo' bucket (never trained on
    — the leakage guard for autocorrelated streams, the time-series
    sibling of ``leakage_safe_split``), everything earlier is train.
    Adds a ``split`` column; pure map-side predicate, so the split is
    scan-speed at any corpus size and deterministic row-for-row."""
    cut = F.lit(cutoff).cast("timestamp")
    start = cut - F.make_interval(secs=F.lit(embargo_s))
    return df.withColumn(
        "split",
        F.when(F.col(ts_col) >= cut, "test")
        .when(F.col(ts_col) >= start, "embargo")
        .otherwise("train"))


def stratified_kfold(df: DataFrame, k: int = 5, strata_col: str = "lang",
                     id_col: str = "doc_id", seed: int = 17) -> DataFrame:
    """Deterministic stratified k-fold assignment: within each
    stratum, rows order by ``md5(seed:id)`` (a reproducible
    pseudo-random permutation) and deal round-robin into ``k`` folds,
    so every fold holds each stratum's share to within one row — the
    cross-validation splitter that keeps minority languages/sources
    represented in every fold. One partitioned rank window per
    stratum; re-seeding re-deals without moving data.

    Returns ``(id, stratum, fold)`` with fold in 0..k-1.
    """
    from pyspark.sql import Window as W
    h = F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string")).cast("binary"))
    w = W.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col), F.col(strata_col).alias("stratum"),
        ((F.row_number().over(w) - 1) % k).cast("long").alias("fold"))
