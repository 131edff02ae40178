"""M10/M11: 2-D embeddings of the reduced (PCA) space.

Reference: RunUMAP(dims=1:30, min.dist=0.3) and RunTSNE(perplexity=
min(30, n/100)) at /root/reference/src/QC_helpers/configureEmbedding.r:
73-100; both are inherently global iterative optimizations, driver-side
over the collected N×d reduced matrix (SURVEY §2.8 strategy [UDF]).

This container has neither umap-learn nor scikit-learn, so:
  - `embed_umap` / `embed_tsne` dispatch to the real libraries when
    importable (production path) and otherwise fall back to
    `spectral_embedding`, clearly reported in the `method` column.
  - `spectral_embedding` is a genuine deterministic 2-D embedding:
    the two smallest non-trivial eigenvectors of the symmetric
    normalized Laplacian of the kNN graph (numpy.linalg.eigh) — the
    same graph structure UMAP optimizes, without the stochastic
    refinement.

Only the reduced matrix (N × ≤50 doubles) crosses to the driver — the
documented ceiling of every embedding implementation, Seurat included.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

EMBEDDING_SCHEMA = StructType([
    StructField("sample", StringType()),
    StructField("barcode", StringType()),
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
    StructField("method", StringType()),
])


def _collect_matrix(pc_cols: DataFrame, ceiling: int | None = None):
    from data_ingest_spark.operators.guards import assert_driver_ceiling
    assert_driver_ceiling(
        pc_cols, "driver-side embedding (_collect_matrix)",
        "spectral_embedding_distributed on the SNN edge list",
        ceiling)
    rows = pc_cols.orderBy("sample", "barcode").collect()
    ids = [(r["sample"], r["barcode"]) for r in rows]
    feat_cols = [c for c in pc_cols.columns if c.startswith("pc_")]
    x = np.array([[r[c] for c in feat_cols] for r in rows], dtype=np.float64)
    return ids, x


def _knn_graph(x: np.ndarray, k: int) -> np.ndarray:
    n = x.shape[0]
    sq = (x ** 2).sum(axis=1)
    a = np.zeros((n, n))
    chunk = 2048
    k = min(k, n - 1)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d2 = sq[lo:hi, None] + sq[None, :] - 2.0 * x[lo:hi] @ x.T
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf
        nbr = np.argpartition(d2, k, axis=1)[:, :k]
        for i, row in enumerate(nbr):
            a[lo + i, row] = 1.0
    return np.maximum(a, a.T)  # symmetrize


def _spectral_2d(x: np.ndarray, k: int = 15) -> np.ndarray:
    a = _knn_graph(x, k)
    d = a.sum(axis=1)
    d_inv_sqrt = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    lap = np.eye(len(a)) - (d_inv_sqrt[:, None] * a * d_inv_sqrt[None, :])
    vals, vecs = np.linalg.eigh(lap)
    # columns 1 and 2: smallest non-trivial eigenvectors; fix sign for
    # determinism (largest-|component| entry made positive)
    out = vecs[:, 1:3].copy()
    for j in range(2):
        i = np.argmax(np.abs(out[:, j]))
        if out[i, j] < 0:
            out[:, j] = -out[:, j]
    return out


def spectral_embedding(pc_cols: DataFrame, k: int = 15,
                       max_driver_rows: int | None = None) -> DataFrame:
    ids, x = _collect_matrix(pc_cols, max_driver_rows)
    emb = _spectral_2d(x, k)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "spectral")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def _umap_lite_2d(x: np.ndarray, n_neighbors: int = 15,
                  min_dist: float = 0.3, n_epochs: int = 200,
                  seed: int = 42) -> np.ndarray:
    """Pure-numpy, fixed-iteration, seeded UMAP-lite (round-7 verdict
    ask #5): spectral initialization + ``n_epochs`` vectorized epochs
    of attraction along the symmetric kNN graph and negative-sampled
    repulsion, using UMAP's low-dimensional similarity curve
    1/(1 + a·d^(2b)). Not the full fuzzy-simplicial-set algorithm
    (no smooth-kNN calibration, batch instead of per-edge SGD), but
    the same graph, the same objective shape, and deterministic:
    identical input → identical output, no thread races, no scipy.

    a/b for min_dist=0.3 match umap-learn's curve fit (1.577, 0.895);
    other min_dist values reuse them (the fallback contract is
    documented, not parameterized — the real kernel dispatches when
    umap-learn is importable)."""
    n = x.shape[0]
    if n <= 3:
        return _spectral_2d(x, min(n_neighbors, max(n - 1, 1)))
    a, b = 1.577, 0.895
    rng = np.random.default_rng(seed)
    adj = _knn_graph(x, min(n_neighbors, n - 1))
    src, dst = np.nonzero(adj)
    keep = src < dst                       # one direction per edge
    src, dst = src[keep], dst[keep]
    emb = _spectral_2d(x, min(n_neighbors, n - 1))
    # scale the spectral init to UMAP's ~10-unit working box so the
    # gradient curve operates in its designed distance regime
    span = np.abs(emb).max() or 1.0
    emb = emb / span * 10.0
    n_neg = 5
    for epoch in range(n_epochs):
        alpha = 1.0 - epoch / n_epochs
        diff = emb[src] - emb[dst]
        d2 = (diff ** 2).sum(axis=1)
        # attraction: d/d(emb) of log(1 + a d^{2b}) along each edge
        grad_coef = (-2.0 * a * b * np.power(np.maximum(d2, 1e-12),
                                             b - 1.0)
                     / (1.0 + a * np.power(d2, b)))
        g = np.clip(grad_coef[:, None] * diff, -4.0, 4.0)
        upd = np.zeros_like(emb)
        np.add.at(upd, src, g)
        np.add.at(upd, dst, -g)
        # repulsion: n_neg seeded negative samples per edge endpoint
        neg = rng.integers(0, n, size=(src.size, n_neg))
        pdiff = emb[src][:, None, :] - emb[neg]
        pd2 = (pdiff ** 2).sum(axis=2)
        rep_coef = (2.0 * b
                    / ((0.001 + pd2)
                       * (1.0 + a * np.power(np.maximum(pd2, 1e-12), b))))
        rg = np.clip(rep_coef[:, :, None] * pdiff, -4.0, 4.0)
        np.add.at(upd, src, rg.sum(axis=1))
        emb = emb + alpha * upd
    # deterministic orientation (the spectral sign convention)
    for j in range(2):
        i = np.argmax(np.abs(emb[:, j]))
        if emb[i, j] < 0:
            emb[:, j] = -emb[:, j]
    return emb


def umap_lite_embedding(pc_cols: DataFrame, n_neighbors: int = 15,
                        min_dist: float = 0.3, n_epochs: int = 200,
                        seed: int = 42,
                        max_driver_rows: int | None = None) -> DataFrame:
    ids, x = _collect_matrix(pc_cols, max_driver_rows)
    emb = _umap_lite_2d(x, n_neighbors, min_dist, n_epochs, seed)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "umap_lite")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def trustworthiness(x: np.ndarray, emb: np.ndarray, k: int = 10) -> float:
    """Trustworthiness T(k) (Venna & Kaski 2001): 1 minus the
    normalized penalty for embedding-neighbors that are not
    high-dimensional neighbors, each weighted by how far down the
    original ranking it actually sits. Pure numpy (sklearn is not
    installable here); O(n²) — a test metric, not an operator."""
    n = x.shape[0]
    k = min(k, n - 2)

    def d2(m):
        sq = (m ** 2).sum(axis=1)
        out = sq[:, None] + sq[None, :] - 2.0 * m @ m.T
        np.fill_diagonal(out, np.inf)
        return out

    dx, de = d2(x), d2(emb)
    rank_x = np.argsort(np.argsort(dx, axis=1), axis=1)  # 0 = nearest
    nn_e = np.argsort(de, axis=1)[:, :k]
    t = 0.0
    for i in range(n):
        r = rank_x[i, nn_e[i]]
        t += np.maximum(r - k + 1, 0).sum()
    denom = n * k * (2 * n - 3 * k - 1) / 2.0
    return 1.0 - (2.0 / denom) * t if denom > 0 else 1.0


def embed_umap(pc_cols: DataFrame, n_neighbors: int = 30,
               min_dist: float = 0.3, seed: int = 42,
               max_driver_rows: int | None = None) -> DataFrame:
    """UMAP when umap-learn is installed; deterministic UMAP-lite
    fallback otherwise (spectral init + fixed seeded
    attraction/repulsion epochs — measured trustworthiness@10 beats
    the plain spectral embedding 0.83 vs 0.72 on 10-D blob fixtures
    and 0.995 vs 0.986 on a 10-D swiss roll; see
    tests/test_ml_pipeline.py). Ceiling-guarded (see
    operators.guards): above ``max_driver_rows`` this raises instead
    of collecting — route to spectral_embedding_distributed."""
    try:
        import umap  # noqa: F401
    except ImportError:
        return umap_lite_embedding(pc_cols, n_neighbors=n_neighbors,
                                   min_dist=min_dist, seed=seed,
                                   max_driver_rows=max_driver_rows)
    ids, x = _collect_matrix(pc_cols, max_driver_rows)
    emb = umap.UMAP(n_neighbors=min(n_neighbors, len(ids) - 1),
                    min_dist=min_dist, random_state=seed).fit_transform(x)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "umap")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def embed_tsne(pc_cols: DataFrame, seed: int = 42,
               max_driver_rows: int | None = None) -> DataFrame:
    """t-SNE with the reference's auto-params (perplexity=min(30,n/100),
    learning.rate=max(200,n/12), configureEmbedding.r:85-100) when
    sklearn is installed; spectral fallback otherwise."""
    try:
        from sklearn.manifold import TSNE  # noqa: F401
    except ImportError:
        return spectral_embedding(pc_cols, k=15,
                                  max_driver_rows=max_driver_rows)
    ids, x = _collect_matrix(pc_cols, max_driver_rows)
    n = len(ids)
    emb = TSNE(perplexity=min(30.0, max(2.0, n / 100.0)),
               learning_rate=max(200.0, n / 12.0),
               random_state=seed, init="pca").fit_transform(x)
    spark = pc_cols.sparkSession
    rows = [(s, b, float(e[0]), float(e[1]), "tsne")
            for (s, b), e in zip(ids, emb)]
    return spark.createDataFrame(rows, EMBEDDING_SCHEMA)


def spectral_embedding_distributed(edges: DataFrame, n_iter: int = 30,
                                   ) -> DataFrame:
    """Distributed Laplacian-eigenmap 2-D embedding of a weighted
    graph (the SNN/kNN graph the driver-side variant eigensolves):
    deflated power iteration on the random-walk operator P = D⁻¹W,
    entirely as joins + groupBys over the edge list — the scale path
    when N×d no longer fits one driver (the known ceiling of
    `spectral_embedding`, Seurat included).

    Method: P's dominant eigenvector is constant (eigenvalue 1); the
    next two give the embedding. Each round multiplies the current
    basis by P (one join + one grouped sum — the same linear shuffle
    as PageRank), then re-orthonormalizes with degree-weighted
    Gram-Schmidt whose SIX inner products come from ONE fused
    aggregation; only those scalars cross to the driver (closed-form
    coefficients applied map-side), and the state localCheckpoints
    every round so lineage stays flat. Deterministic: init derives
    from md5(id), iteration count fixed, and each output column's
    global sign makes the smallest-id node among the half-max-|value|
    set positive (ulp-tolerant anchor).

    Returns (id, x, y, method='spectral_dist'). Expects an UNDIRECTED
    edge list (src, dst, snn_weight) — pass both directions like
    clustering's `_undirect`."""
    from pyspark.sql import functions as F

    from data_ingest_spark.operators.clustering import pin_partitioning

    # pin hash(dst) across all power-iteration rounds (persisted
    # repartition — a checkpoint alone loses the partitioning under
    # AQE; see clustering.pin_partitioning): each round's propagation
    # join then only exchanges the node-sized state frame.
    und = pin_partitioning(
        edges.select("src", "dst", "snn_weight"), "dst")
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.sum("snn_weight").alias("deg")).localCheckpoint()

    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7),
               16, 10).cast("double")
    h2 = F.conv(F.substring(F.md5(F.concat(F.lit("2|"),
                                           F.col("id").cast("string"))),
                            1, 7), 16, 10).cast("double")
    state = deg.select(
        "id", "deg",
        (h / F.lit(float(1 << 28)) - 0.5).alias("v1"),
        (h2 / F.lit(float(1 << 28)) - 0.5).alias("v2"))

    def _orthonormalize(s: DataFrame) -> DataFrame:
        """Degree-weighted Gram-Schmidt vs the constant vector and
        between columns. Raw moments in ONE aggregation whose 1-row
        result BROADCASTS back — the closed-form coefficients are
        Column expressions, so a round is a single Spark job (the
        checkpoint) instead of a driver collect + a job. At 20
        iterations that halves the scheduling bill, which dominates
        this operator's local wall-clock."""
        m = s.agg(
            F.sum("deg").alias("_d"),
            F.sum(F.col("deg") * F.col("v1")).alias("_d1"),
            F.sum(F.col("deg") * F.col("v2")).alias("_d2"),
            F.sum(F.col("deg") * F.col("v1") * F.col("v1")).alias("_s11"),
            F.sum(F.col("deg") * F.col("v1") * F.col("v2")).alias("_s12"),
            F.sum(F.col("deg") * F.col("v2") * F.col("v2")).alias("_s22"))
        d, d1, d2 = F.col("_d"), F.col("_d1"), F.col("_d2")
        a, b = d1 / d, d2 / d
        n1sq = F.greatest(F.col("_s11") - d1 * d1 / d, F.lit(1e-300))
        c12 = F.col("_s12") - d1 * d2 / d
        n2sq = F.greatest((F.col("_s22") - d2 * d2 / d) - c12 * c12 / n1sq,
                          F.lit(1e-300))
        g = c12 / n1sq
        u1 = F.col("v1") - a
        u2 = (F.col("v2") - b) - g * u1
        return (s.crossJoin(F.broadcast(m))
                .select("id", "deg",
                        (u1 * F.pow(n1sq, F.lit(-0.5))).alias("v1"),
                        (u2 * F.pow(n2sq, F.lit(-0.5))).alias("v2")))

    # lazy per-round checkpoints (the LPA finding): _orthonormalize
    # references its input twice (moment aggregation + the rescale
    # select), so without a per-round barrier the plan tree doubles
    # per round; lazy keeps the flattening without a blocking driver
    # job per iteration.
    state = _orthonormalize(state).localCheckpoint(eager=False)
    for _ in range(n_iter):
        nbr = (und.join(state.select(F.col("id").alias("dst"),
                                     F.col("v1").alias("_w1"),
                                     F.col("v2").alias("_w2")), "dst")
               .groupBy(F.col("src").alias("id"))
               .agg(F.sum(F.col("snn_weight") * F.col("_w1")).alias("s1"),
                    F.sum(F.col("snn_weight") * F.col("_w2")).alias("s2")))
        state = (state.join(nbr, "id", "left")
                 .select("id", "deg",
                         (F.coalesce("s1", F.lit(0.0))
                          / F.col("deg")).alias("v1"),
                         (F.coalesce("s2", F.lit(0.0))
                          / F.col("deg")).alias("v2")))
        state = _orthonormalize(state).localCheckpoint(eager=False)

    # deterministic global sign: the smallest-id node among those with
    # |value| >= half the max is made positive — scalar lookups, never
    # a global sort. Anchoring on exact max-|value| equality is NOT
    # run-stable: on symmetric graphs many nodes tie at the max up to
    # float-summation ulps, and the ulp ordering (hence the tiebreak
    # node, hence the global sign) varies with reduce order. The
    # half-max cut is ulp-tolerant, and the anchor's own sign is well
    # away from zero by construction.
    out = state
    for c in ("v1", "v2"):
        mx = out.agg(F.max(F.abs(F.col(c)))).first()[0]
        if not mx or mx <= 0.0:
            continue
        val = (out.filter(F.abs(F.col(c)) >= F.lit(0.5 * mx))
               .agg(F.min_by(c, "id")).first()[0])
        if val is not None and val < 0:
            out = out.withColumn(c, -F.col(c))
    return out.select("id", F.col("v1").alias("x"),
                      F.col("v2").alias("y"),
                      F.lit("spectral_dist").alias("method"))
