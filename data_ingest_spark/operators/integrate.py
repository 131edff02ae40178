"""M9: cross-sample integration (batch correction) in reduced space.

Reference: FindIntegrationAnchors + IntegrateData (Seurat v4 rPCA,
dims 1:30) at /root/reference/src/QC_helpers/dataIntegration.r:86-103,
fired only when nsamples > 1.

v1 re-derivation (SURVEY §2.8 [UDF]): mutual-nearest-neighbor (MNN)
anchors between each sample and a reference sample in PCA space;
correction vector per anchor = ref_vec − query_vec; each query cell is
corrected by the inverse-distance-weighted mean of its nearest
anchors' correction vectors. This is the core of Seurat's
anchor-integrate loop minus the CCA/rPCA re-basis and anchor scoring.
Driver-side numpy over the N×d reduced matrix (same ceiling as
M10/M11).

v2 (:func:`integrate_mnn_distributed`) is the 100 TB path: the MNN
search is two LSH-bucketed Euclidean similarity joins
(BucketedRandomProjectionLSH — never all-pairs), the mutual filter is
an equi-join of the two directed edge lists, and the correction is a
grouped weighted mean expressed as d codegen aggregate expressions —
no driver-side matrix, no collect beyond the 1-row reference-sample
lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def _matrices_by_sample(pc_cols: DataFrame, ceiling: int | None = None):
    """One Arrow exchange (DataFrame.toArrow) instead of a Row-object
    collect — the m12 zero-copy staging discipline: each pc_* column
    lands as a contiguous float64 buffer, the N×d matrix is a
    column_stack, and samples slice out of the sorted frame via
    searchsorted. No per-row Python anywhere."""
    from data_ingest_spark.operators.guards import assert_driver_ceiling
    assert_driver_ceiling(
        pc_cols, "driver-side MNN integration (_matrices_by_sample)",
        "integrate_mnn_distributed", ceiling)
    feat_cols = [c for c in pc_cols.columns if c.startswith("pc_")]
    tbl = (pc_cols.select("sample", "barcode", *feat_cols)
           .orderBy("sample", "barcode").toArrow())
    n = tbl.num_rows
    samples = np.asarray(tbl.column("sample").to_pylist(), dtype=object)
    bcs = tbl.column("barcode").to_pylist()
    if n:
        mat = np.column_stack(
            [np.asarray(tbl.column(c).combine_chunks(), dtype=np.float64)
             for c in feat_cols])
    else:
        mat = np.zeros((0, len(feat_cols)))
    out: dict[str, tuple[list[str], np.ndarray]] = {}
    for s in np.unique(samples) if n else ():
        a = int(np.searchsorted(samples, s, side="left"))
        b = int(np.searchsorted(samples, s, side="right"))
        out[s] = (bcs[a:b], mat[a:b])
    return out, feat_cols


def _mnn_pairs(a: np.ndarray, b: np.ndarray, k: int) -> list[tuple[int, int]]:
    d2 = ((a ** 2).sum(1)[:, None] + (b ** 2).sum(1)[None, :]
          - 2.0 * a @ b.T)
    ka = min(k, b.shape[0])
    kb = min(k, a.shape[0])
    nn_ab = np.argpartition(d2, ka - 1, axis=1)[:, :ka]
    nn_ba = np.argpartition(d2.T, kb - 1, axis=1)[:, :kb]
    back = [set(row) for row in nn_ba]
    return [(i, j) for i in range(a.shape[0]) for j in nn_ab[i]
            if i in back[j]]


def integrate_mnn(pc_cols: DataFrame, k_anchor: int = 5,
                  k_weight: int = 10,
                  max_driver_rows: int | None = None) -> DataFrame:
    """Corrected reduced space: first sample (sorted) is the reference;
    every other sample is shifted by locally-weighted MNN correction
    vectors. Returns the same (sample, barcode, pc_*) schema."""
    mats, feat_cols = _matrices_by_sample(pc_cols, max_driver_rows)
    samples = sorted(mats)
    ref_s = samples[0]
    ref_bcs, ref_m = mats[ref_s]
    frames = [(ref_s, ref_bcs, ref_m)]

    for s in samples[1:]:
        bcs, m = mats[s]
        pairs = _mnn_pairs(m, ref_m, k_anchor)
        if not pairs:
            corrected = m
        else:
            qi = np.fromiter((i for i, _ in pairs), dtype=np.int64)
            rj = np.fromiter((j for _, j in pairs), dtype=np.int64)
            anchor_q = m[qi]
            corr_vecs = ref_m[rj] - m[qi]
            d2 = ((m ** 2).sum(1)[:, None] + (anchor_q ** 2).sum(1)[None, :]
                  - 2.0 * m @ anchor_q.T)
            kw = min(k_weight, len(pairs))
            nbr = np.argpartition(d2, kw - 1, axis=1)[:, :kw]
            # vectorized inverse-distance weighting (no per-cell loop)
            d2_k = np.maximum(np.take_along_axis(d2, nbr, axis=1), 0.0)
            w = 1.0 / (1.0 + d2_k)
            w /= w.sum(axis=1, keepdims=True)
            corrected = m + np.einsum("ik,ikd->id", w, corr_vecs[nbr])
        frames.append((s, bcs, corrected))

    spark = pc_cols.sparkSession
    # Arrow-backed assembly: one pandas frame, no per-row tuples
    out = pd.concat([
        pd.DataFrame({"sample": np.repeat(s, len(bcs)), "barcode": bcs,
                      **{c: mat[:, i].astype(np.float64)
                         for i, c in enumerate(feat_cols)}})
        for s, bcs, mat in frames], ignore_index=True)
    schema = "sample string, barcode string, " + ", ".join(
        f"{c} double" for c in feat_cols)
    return spark.createDataFrame(out, schema=schema)


def _with_ml_vec(df: DataFrame, feat_cols: list[str]) -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    return df.withColumn(
        "_vml",
        array_to_vector(F.array(*[F.col(c).cast("double")
                                  for c in feat_cols])))


def integrate_mnn_distributed(pc_cols: DataFrame, k_anchor: int = 5,
                              k_weight: int = 10,
                              bucket_length: float = 10.0,
                              num_tables: int = 3,
                              max_pair_dist: float = 1e9,
                              seed: int = 42) -> DataFrame:
    """M9 v2 — fully distributed MNN integration. Same semantics as
    :func:`integrate_mnn` (reference = lexicographically first sample,
    anchors = mutual k-nearest pairs, correction = inverse-squared-
    distance-weighted mean of the k_weight nearest anchors' vectors),
    re-expressed as DataFrame ops:

      1. directional kNN both ways via ONE LSH Euclidean similarity
         join (query×ref) ranked per side — bucketed, never all-pairs;
         ``bucket_length`` tunes recall vs bucket occupancy and
         ``max_pair_dist`` bounds the join radius at scale.
      2. mutual filter: inner join of the two directed top-k lists.
      3. correction vectors (ref − query) attached by id joins.
      4. per-cell weighting: a second LSH join cell×anchor-point,
         top-``k_weight`` per cell, then a groupBy(cell) with d
         codegen sum expressions — arrays never explode.

    Ties rank deterministically by (distance, anchor id). Cells in a
    sample with no in-range anchors pass through uncorrected (the v1
    contract for anchorless samples, applied per cell).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    feat_cols = [c for c in pc_cols.columns if c.startswith("pc_")]
    ref_s = pc_cols.agg(F.min("sample")).collect()[0][0]
    if ref_s is None:
        return pc_cols.select("sample", "barcode", *feat_cols)
    ref = pc_cols.filter(F.col("sample") == ref_s)
    qry = pc_cols.filter(F.col("sample") != ref_s)
    # SLIM (id, vector) projections for the similarity joins: the
    # join/distinct inside approxSimilarityJoin carries both sides as
    # nested structs, and dragging d wide columns through it blows the
    # struct width (codegen + hash-aggregate over ~140-field rows);
    # coordinates re-attach by id afterwards.
    vref = _with_ml_vec(ref, feat_cols).select("sample", "barcode", "_vml")
    vqry = _with_ml_vec(qry, feat_cols).select("sample", "barcode", "_vml")

    lsh = BucketedRandomProjectionLSH(
        inputCol="_vml", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed)
    model = lsh.fit(vref)

    pairs = (model.approxSimilarityJoin(vqry, vref, max_pair_dist,
                                        distCol="_d")
             .select(F.col("datasetA.sample").alias("sample"),
                     F.col("datasetA.barcode").alias("qb"),
                     F.col("datasetB.barcode").alias("rb"),
                     F.col("_d").alias("_d"))
             .localCheckpoint(eager=False))
    w_q = W.partitionBy("sample", "qb").orderBy("_d", "rb")
    w_r = W.partitionBy("sample", "rb").orderBy("_d", "qb")
    fwd = (pairs.withColumn("_rk", F.row_number().over(w_q))
           .filter(F.col("_rk") <= k_anchor).select("sample", "qb", "rb"))
    bwd = (pairs.withColumn("_rk", F.row_number().over(w_r))
           .filter(F.col("_rk") <= k_anchor).select("sample", "qb", "rb"))
    mutual = fwd.join(bwd, ["sample", "qb", "rb"])

    # anchor rows: query-side coordinates + the correction vector
    q_side = qry.select("sample", F.col("barcode").alias("qb"),
                        *[F.col(c).alias(f"_q{i}")
                          for i, c in enumerate(feat_cols)])
    r_side = ref.select(F.col("barcode").alias("rb"),
                        *[F.col(c).alias(f"_r{i}")
                          for i, c in enumerate(feat_cols)])
    anchors = (mutual.join(q_side, ["sample", "qb"]).join(r_side, "rb")
               .select("sample",
                       F.concat_ws("|", "qb", "rb").alias("_aid"),
                       *[F.col(f"_q{i}") for i in range(len(feat_cols))],
                       *[(F.col(f"_r{i}") - F.col(f"_q{i}"))
                         .alias(f"_c{i}") for i in range(len(feat_cols))])
               .localCheckpoint(eager=False))
    v_anchor = (_with_ml_vec(anchors,
                             [f"_q{i}" for i in range(len(feat_cols))])
                .select(F.col("sample").alias("_asample"), "_aid", "_vml"))

    near = (model.approxSimilarityJoin(vqry, v_anchor, max_pair_dist,
                                       distCol="_d")
            .filter(F.col("datasetA.sample") == F.col("datasetB._asample"))
            .select(F.col("datasetA.sample").alias("sample"),
                    F.col("datasetA.barcode").alias("barcode"),
                    F.col("datasetB._aid").alias("_aid"),
                    F.col("_d").alias("_d")))
    w_c = W.partitionBy("sample", "barcode").orderBy("_d", "_aid")
    wgt = F.lit(1.0) / (F.lit(1.0) + F.col("_d") * F.col("_d"))
    corr = (near.withColumn("_rk", F.row_number().over(w_c))
            .filter(F.col("_rk") <= k_weight)
            .withColumn("_w", wgt)
            .join(anchors.select("sample", "_aid",
                                 *[f"_c{i}"
                                   for i in range(len(feat_cols))]),
                  ["sample", "_aid"])
            .groupBy("sample", "barcode")
            .agg(*[(F.sum(F.col(f"_c{i}") * F.col("_w")) / F.sum("_w"))
                   .alias(f"_m{i}") for i in range(len(feat_cols))]))

    fixed = (qry.join(corr, ["sample", "barcode"], "left")
             .select("sample", "barcode",
                     *[(F.col(c) + F.coalesce(F.col(f"_m{i}"), F.lit(0.0)))
                       .alias(c) for i, c in enumerate(feat_cols)]))
    return (ref.select("sample", "barcode", *feat_cols)
            .unionByName(fixed))


def mnn_anchor_pairs(pc_arr: DataFrame, sample_a: str, sample_b: str,
                     k: int = 5, id_col: str = "barcode",
                     vec_col: str = "pc",
                     max_pairs: int | None = None) -> DataFrame:
    """The exact-kNN core of MNN anchor finding, as a hash-checkable
    DataFrame op: (ida, idb, d2) pairs where each side ranks within
    the other's k nearest (squared Euclidean, ties broken by id — the
    mutual-nearest-neighbor definition of dataIntegration.r's
    FindIntegrationAnchors stage, minus the rPCA re-basis).

    Plan: the reference batch broadcasts against the query batch (the
    per-batch reduced matrix is N×d, the same object every anchor
    implementation holds), distances are a codegen zip_with/aggregate
    fold, and the two rank windows reuse one cross table — two
    shuffles. At 100× batch sizes swap the broadcast cross for the
    LSH candidate join of :func:`integrate_mnn_distributed`; this
    exact variant is its correctness anchor. The cartesian is
    ceiling-guarded (guards.assert_pair_ceiling, default 100M pairs):
    above-ceiling batches fail fast with a pointer at the LSH sibling
    instead of silently enumerating 10⁶ × 10⁶."""
    from data_ingest_spark.operators.guards import assert_pair_ceiling
    a = (pc_arr.filter(F.col("sample") == sample_a)
         .select(F.col(id_col).alias("ida"), F.col(vec_col).alias("va")))
    b = (pc_arr.filter(F.col("sample") == sample_b)
         .select(F.col(id_col).alias("idb"), F.col(vec_col).alias("vb")))
    assert_pair_ceiling(a.count(), b.count(),
                        "exact MNN anchor search (mnn_anchor_pairs)",
                        "integrate_mnn_distributed", max_pairs)
    d2 = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    # Rank on the 6dp-rounded distance (same convention as the m12
    # kNN / hard-negative queries): last-ulp float differences between
    # Spark and the oracle engine could otherwise flip near-tie ranks
    # at the k boundary.
    scored = (a.join(F.broadcast(b))
              .withColumn("_d2", F.round(d2, 6)))
    wa = W.partitionBy("ida").orderBy("_d2", "idb")
    wb = W.partitionBy("idb").orderBy("_d2", "ida")
    return (scored
            .withColumn("_ra", F.row_number().over(wa))
            .withColumn("_rb", F.row_number().over(wb))
            .filter((F.col("_ra") <= k) & (F.col("_rb") <= k))
            .select("ida", "idb", F.col("_d2").alias("d2")))


#: One scoring task's worth of query×ref pairs (the knn_exact task-
#: size yardstick: ~4e6 dot products ≈ 0.1-0.3 s of BLAS); the
#: scoring exchange is taken at >= 4 tasks' worth of work.
_SCORING_PAIRS_PER_TASK = 4_000_000


def _scoring_exchange_pays(n_qry: int, n_ref: int) -> bool:
    """Whether integrate_mnn_exact's scoring maps should pay a
    repartition to full parallelism (see the comment at the call
    site): True when the O(n_qry·n_ref) BLAS amounts to at least ~4
    tasks of work, so a 1-2-split scan would bottleneck a multi-node
    cluster; False for small inputs where the scan's own splits win
    (an unconditional exchange measured +0.25 s at sf0.1)."""
    return n_qry * n_ref >= 4 * _SCORING_PAIRS_PER_TASK


def integrate_mnn_exact(pc_arr: DataFrame, k_anchor: int = 5,
                        k_weight: int = 10, scale: int = 10**6,
                        id_col: str = "barcode",
                        vec_col: str = "pc",
                        max_pairs: int | None = None) -> DataFrame:
    """Oracle-exact MNN integration: the complete v1/v2 semantics
    (reference = lexicographically first sample, mutual-k-nearest
    anchors, inverse-squared-distance-weighted mean of the k_weight
    nearest anchors' correction vectors) in a form a SQL oracle can
    replay bit-for-bit. Returns ``(sample, barcode, dim, value)`` —
    per-dimension rows, values rounded to 6dp at the very end.

    Determinism recipe (the same toolbox as lloyd_centroids /
    m13_louvain_dist): every DISTANCE is an exact int64 fixed-point
    fold, so all ranks/tie-breaks are integer-deterministic; every
    float SUM folds over an array_sort-ed anchor list, so the IEEE
    addition sequence is pinned; weights come from one shared double
    expression ``1/(1 + d2/scale²)``.

    Plan: the reference batch and the anchor table broadcast (both are
    the small side by construction); ranks window on (sample, cell);
    the correction is ONE groupBy(cell) holding k_weight structs.
    For corpora past broadcast range use
    :func:`integrate_mnn_distributed` (LSH candidates, rows-only)."""
    sc2 = float(scale) * float(scale)
    q = pc_arr.select(
        "sample", F.col(id_col).alias("cb"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * scale)
                    .cast("long")).alias("cq"))
    head = q.agg(F.min("sample").alias("r"),
                 F.max(F.size("cv")).alias("d")).first()
    ref_s, dims = head["r"], head["d"] or 0
    if ref_s is None:
        return pc_arr.sparkSession.createDataFrame(
            [], "sample string, barcode string, dim int, value double")
    ref = q.filter(F.col("sample") == ref_s)
    qry = q.filter(F.col("sample") != ref_s).localCheckpoint(eager=False)

    # The query × reference cross below is the correctness anchor and
    # deliberately exact; the guard makes "exact on a cluster-sized
    # batch" an error instead of a 10⁶ × 10⁶ cartesian. Both counts
    # are cheap: ref/qry are slim projections of one scan, and qry is
    # about to be materialized by its checkpoint anyway.
    from data_ingest_spark.operators.guards import assert_pair_ceiling
    n_qry, n_ref = qry.count(), ref.count()
    assert_pair_ceiling(n_qry, n_ref,
                        "exact MNN integration (integrate_mnn_exact)",
                        "integrate_mnn_distributed or integrate_auto",
                        max_pairs)

    # Candidate search is map-side BLAS against the broadcast ref
    # matrix — the knn_exact shape — instead of a |qry|×|ref| row
    # exchange scored pair-by-pair (the previous form; 36M exchanged
    # rows and 266 s at the local sf1 probe, 60x for 10x data).
    # Exactness is preserved: quantized coords are ~1e6, so every
    # float64 intermediate of the matmul identity stays < 2^53 and
    # d2 round-trips to the identical int64 the pair fold produced;
    # tie-breaks replay the (d2, rb) / (d2, qb) lexicographic ranks.
    # Each qry partition emits ONLY its per-query top-k plus its
    # per-(sample, ref) partial top-k; the global per-ref rank is a
    # window over the k·|ref|·partitions partials (two-phase top-k —
    # a partition's beyond-top-k rows can never rank globally).
    ref_tbl = ref.select("cb", "cq").toArrow()
    rb_ids = np.array(ref_tbl.column("cb").to_pylist(), dtype=object)
    if len(rb_ids):
        rflat = np.asarray(ref_tbl.column("cq").combine_chunks()
                           .flatten(), dtype=np.float64)
        rmat = rflat.reshape(len(rb_ids), -1)
    else:
        rmat = np.zeros((0, max(dims, 1)))
    # store ref in rb-string order: a STABLE argsort along the ref
    # axis then breaks distance ties toward the smaller rb — the
    # exact (d2, rb) rank the oracle replays
    rb_order = np.argsort(rb_ids.astype(str), kind="stable")
    rb_ids = rb_ids[rb_order]
    rmat = rmat[rb_order] if len(rb_ids) else rmat
    rr_sq = (rmat * rmat).sum(axis=1)
    bc_ref = pc_arr.sparkSession.sparkContext.broadcast(
        (rb_ids, rmat, rr_sq))
    ka = k_anchor

    def mnn_fn(batches):
        rb_ids_, rmat_, rr_ = bc_ref.value
        nref = rmat_.shape[0]
        take = min(ka, nref)
        # block rows so the float64 d2 tile stays ~64MB at any |ref|
        blk = max(1, int(8_000_000 / max(nref, 1)))
        for pdf in batches:
            if not len(pdf) or not nref:
                continue
            out = []
            for smp, grp in pdf.groupby("sample", sort=False):
                qmat = np.stack(grp["cq"].values).astype(np.float64)
                cbs = grp["cb"].to_numpy(dtype=object)
                # qb-string order so the stable argsort along the
                # query axis encodes the (d2, qb) tie-break
                oq = np.argsort(cbs.astype(str), kind="stable")
                qmat, cbs = qmat[oq], cbs[oq]
                for lo in range(0, qmat.shape[0], blk):
                    q = qmat[lo:lo + blk]
                    d2 = ((q * q).sum(axis=1)[:, None] + rr_[None, :]
                          - 2.0 * (q @ rmat_.T))
                    d2i = np.rint(d2).astype(np.int64)
                    rows = d2i.shape[0]
                    # Top-k on both axes via partition + ≤-threshold
                    # mask + ONE lexsort of the kept entries (the
                    # knn_exact kernel shape) — a full stable argsort
                    # of the tile per axis was the dominant cost of
                    # the whole operator on memory-bound hosts. d2 is
                    # integer-exact, so the value threshold keeps ties
                    # losslessly; the lexsort minor key replays the
                    # (d2, rb) / (d2, qb) order because both axes are
                    # pre-sorted by id string.
                    # per-query top-k (exact (d2, rb) order)
                    kq = np.partition(d2i, take - 1,
                                      axis=1)[:, take - 1:take]
                    ri, ci = np.nonzero(d2i <= kq)
                    vals = d2i[ri, ci]
                    oq_ = np.lexsort((ci, vals, ri))
                    cnt = np.bincount(ri, minlength=rows)
                    st = np.concatenate(([0], np.cumsum(cnt[:-1])))
                    sel = oq_[(st[:, None]
                               + np.arange(take)[None, :]).ravel()]
                    out.append(pd.DataFrame({
                        "sample": smp,
                        "qb": np.repeat(cbs[lo:lo + blk], take),
                        "rb": rb_ids_[ci[sel]],
                        "_d2": vals[sel],
                        "_side": "q"}))
                    # per-ref BLOCK-partial top-k (exact (d2, qb)
                    # order); the global per-ref rank is the window
                    # downstream — block partials are a superset
                    kr = min(take, rows)
                    kref = np.partition(d2i, kr - 1,
                                        axis=0)[kr - 1:kr, :]
                    ri2, ci2 = np.nonzero(d2i <= kref)
                    vals2 = d2i[ri2, ci2]
                    or_ = np.lexsort((ri2, vals2, ci2))
                    cnt2 = np.bincount(ci2, minlength=nref)
                    st2 = np.concatenate(([0], np.cumsum(cnt2[:-1])))
                    sel2 = or_[(st2[:, None]
                                + np.arange(kr)[None, :]).ravel()]
                    out.append(pd.DataFrame({
                        "sample": smp,
                        "qb": cbs[lo:lo + blk][ri2[sel2]],
                        "rb": np.repeat(rb_ids_, kr),
                        "_d2": vals2[sel2],
                        "_side": "r"}))
            yield pd.concat(out, ignore_index=True) if out else \
                pd.DataFrame({"sample": [], "qb": [], "rb": [],
                              "_d2": pd.Series([], dtype="int64"),
                              "_side": []})

    # Spread the scoring maps to full parallelism WHEN THE WORK PAYS
    # FOR AN EXCHANGE (the knn_exact lesson, r10, made data-derived):
    # qry inherits the parquet scan's split count — a ~21 MB scan at
    # sf1 arrives as TWO partitions, so the O(|qry|·|ref|) BLAS below
    # runs as a 2-task stage on the query's critical path. On a
    # multi-node cluster that caps the scoring at two executors no
    # matter the cluster size; the repartition is what lets it use
    # every node. Honest local caveat (measured r10): on local[32]
    # an interleaved sf1 A/B is a WASH (min 8.4 s with vs 8.7 s
    # without, both task orders) because numpy's implicit BLAS
    # threading already spreads the 2 workers' matmuls across the one
    # shared-memory host — a confound a real cluster does not have.
    # The exchange is gated on the pair count ALREADY computed for
    # the ceiling guard above (below ~4 tasks' worth of scoring at
    # 4e6 pairs/task the scan's own splits win — an unconditional
    # exchange measured +0.25 s at sf0.1, interleaved) and carries
    # only (sample, cb, cq) — cv stays out of it (project before the
    # exchange, guide §2.3); BOTH map stages read the same frame.
    # Partition layout never affects results: every row's top-k is
    # scored against the full broadcast ref/anchor matrix, and the
    # per-ref block partials are supersets that the downstream window
    # ranks globally.
    qpar = qry.select("sample", "cb", "cq")
    if _scoring_exchange_pays(n_qry, n_ref):
        qpar = qpar.repartition(pc_arr.sparkSession.sparkContext
                                .defaultParallelism)
    scored = (qpar
              .mapInPandas(mnn_fn, "sample string, qb string, "
                                   "rb string, _d2 long, _side string")
              .localCheckpoint(eager=False))
    wb = W.partitionBy("sample", "rb").orderBy("_d2", "qb")
    ref_top = (scored.filter(F.col("_side") == "r")
               .withColumn("_rb", F.row_number().over(wb))
               .filter(F.col("_rb") <= k_anchor)
               .select("sample", "qb", "rb"))
    mutual = (scored.filter(F.col("_side") == "q")
              .select("sample", "qb", "rb")
              .join(ref_top, ["sample", "qb", "rb"]))
    # mutual (≤ k_anchor·|ref| rows) is the broadcast side; qry stays
    # the streamed big table.
    anchors = (qry.select("sample", F.col("cb").alias("qb"),
                          F.col("cv").alias("qv"),
                          F.col("cq").alias("aq"))
               .join(F.broadcast(mutual), ["sample", "qb"])
               .join(F.broadcast(ref.select(
                   F.col("cb").alias("rb"), F.col("cv").alias("rv"))),
                   "rb")
               .select("sample",
                       F.concat_ws("|", "qb", "rb").alias("aid"),
                       "aq",
                       F.zip_with("rv", "qv", lambda r, v: r - v)
                       .alias("corr"))
               .localCheckpoint(eager=False))

    # Per-cell anchor top-k INSIDE a map stage (the knn_exact shape):
    # the anchor table is ≤ k_anchor·|ref| rows by construction, so it
    # broadcasts as int64 matrices; each cell scores all of its
    # sample's anchors vectorized and only k_weight rows leave the
    # stage — replacing a cells×anchors exchange (1.4M rows at sf0.1,
    # measured 5.3s) with the map-side selection. Top-k order
    # replicates the (d2, aid) rank exactly: int64 distances +
    # lexicographic aid rank.
    anc_rows = anchors.select("sample", "aid", "aq").collect()
    by_sample: dict = {}
    for r in anc_rows:
        by_sample.setdefault(r["sample"], ([], []))
        by_sample[r["sample"]][0].append(r["aid"])
        by_sample[r["sample"]][1].append(r["aq"])
    packed = {}
    for smp, (aids, mats) in by_sample.items():
        aid_arr = np.array(aids, dtype=object)
        order = np.argsort(aid_arr.astype(str))
        aid_rank = np.empty(len(aids), dtype=np.int64)
        aid_rank[order] = np.arange(len(aids))
        packed[smp] = (aid_arr, aid_rank,
                       np.array(mats, dtype=np.int64))
    bc = pc_arr.sparkSession.sparkContext.broadcast(packed)
    kw = k_weight

    def topk_fn(batches):
        for pdf in batches:
            out_s, out_c, out_a, out_d = [], [], [], []
            for smp, grp in pdf.groupby("sample", sort=False):
                if smp not in bc.value:
                    continue
                aid_arr, aid_rank, amat = bc.value[smp]
                m = amat.shape[0]
                qmat = np.stack(grp["cq"].values).astype(np.int64,
                                                         copy=False)
                qq = (qmat * qmat).sum(axis=1)
                aa = (amat * amat).sum(axis=1)
                d2 = qq[:, None] + aa[None, :] - 2 * (qmat @ amat.T)
                take = min(kw, m)
                cbs = grp["cb"].to_numpy(dtype=object)
                for i in range(len(cbs)):
                    sel = np.lexsort((aid_rank, d2[i]))[:take]
                    out_s.extend([smp] * take)
                    out_c.extend([cbs[i]] * take)
                    out_a.extend(aid_arr[sel])
                    out_d.extend(d2[i][sel])
            yield pd.DataFrame({"sample": out_s, "cb": out_c,
                                "aid": out_a,
                                "_da": pd.Series(out_d, dtype="int64")})

    near = (qpar
            .mapInPandas(topk_fn,
                         "sample string, cb string, aid string, _da long")
            .join(F.broadcast(anchors.select("sample", "aid", "corr")),
                  ["sample", "aid"])
            .withColumn("_w", F.lit(1.0) /
                        (F.lit(1.0)
                         + F.col("_da").cast("double") / F.lit(sc2))))

    zeros = F.array(*[F.lit(0.0) for _ in range(dims)])
    lst = F.array_sort(F.collect_list(F.struct(
        F.col("_da").alias("d"), F.col("aid").alias("a"),
        F.col("_w").alias("w"), F.col("corr").alias("c"))))
    sumw = F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x["w"])
    sumc = F.aggregate(
        lst, zeros,
        lambda acc, x: F.zip_with(acc, x["c"],
                                  lambda a, c: a + c * x["w"]))
    corr_mean = (near.groupBy("sample", "cb")
                 .agg(F.transform(sumc, lambda s: s / sumw).alias("m")))

    fixed = (qry.join(corr_mean, ["sample", "cb"], "left")
             .select("sample", F.col("cb").alias("barcode"),
                     F.posexplode(F.when(
                         F.col("m").isNotNull(),
                         F.zip_with("cv", "m", lambda v, m: v + m))
                         .otherwise(F.col("cv"))).alias("dim", "value")))
    passthrough = ref.select(
        "sample", F.col("cb").alias("barcode"),
        F.posexplode("cv").alias("dim", "value"))
    # + 0.0 collapses IEEE −0.0 (a rounded tiny negative) to +0.0 —
    # both engines apply the same normalization before hashing.
    return (passthrough.unionByName(fixed)
            .select("sample", "barcode", F.col("dim").cast("int").alias("dim"),
                    (F.round("value", 6) + F.lit(0.0)).alias("value")))


def integrate_auto(pc_arr: DataFrame, k_anchor: int = 5,
                   k_weight: int = 10,
                   max_pairs: int | None = None,
                   id_col: str = "barcode",
                   vec_col: str = "pc", **lsh_kwargs) -> DataFrame:
    """Strategy gate mirroring ``knn_auto``: exact MNN integration
    while query × reference stays under the broadcast-cartesian
    ceiling, LSH-bucketed :func:`integrate_mnn_distributed` beyond it.
    The two cheap counts reuse the slim projection the exact path
    would build anyway. Output schema follows the chosen path:
    per-dimension rows (exact) vs per-cell wide columns (distributed)
    — both carry (sample, barcode) keys."""
    from data_ingest_spark.operators.guards import PAIR_CEILING
    lim = PAIR_CEILING if max_pairs is None else max_pairs
    ref_s = pc_arr.agg(F.min("sample")).collect()[0][0]
    if ref_s is None:
        return pc_arr.sparkSession.createDataFrame(
            [], "sample string, barcode string, dim int, value double")
    n_ref = pc_arr.filter(F.col("sample") == ref_s).count()
    n_qry = pc_arr.filter(F.col("sample") != ref_s).count()
    if n_qry * n_ref <= lim:
        return integrate_mnn_exact(pc_arr, k_anchor=k_anchor,
                                   k_weight=k_weight, id_col=id_col,
                                   vec_col=vec_col, max_pairs=max_pairs)
    dims = pc_arr.select(F.max(F.size(vec_col))).collect()[0][0] or 0
    pc_cols = pc_arr.select(
        "sample", F.col(id_col).alias("barcode"),
        *[F.col(vec_col).getItem(i).cast("double").alias(f"pc_{i}")
          for i in range(dims)])
    return integrate_mnn_distributed(pc_cols, k_anchor=k_anchor,
                                     k_weight=k_weight, **lsh_kwargs)
