"""Similarity search over an embedding column (`array<float>`).

Three tiers:

  cosine_topk         — brute-force exact top-k: broadcast the query
                        set against the full corpus. O(N·Q·d) but
                        embarrassingly parallel and exact — the
                        baseline and the verifier for the ANN tiers.
  cosine_topk_ivf     — IVF-style: restrict each query to its coarse
                        cell (here the `label` column stands in for a
                        k-means cell id; in production the cell id is
                        assigned by a trained coarse quantizer). The
                        join keys on the cell, so the shuffle is
                        cell-partitioned — N/cells work per query.
  cosine_topk_lsh     — random-hyperplane LSH: sign-bit bucket from
                        fixed md5-derived hyperplanes; queries only
                        compare within their bucket. Deterministic
                        planes → oracle-checkable.

All arithmetic is float64 (cast up from float32 storage) and every
similarity is rounded to 6dp BEFORE ranking, with the neighbor id as
tie-break, so ordering is reproducible across engines.

100 TB posture: the corpus side is never collected or broadcast — only
the (small) query set is. The cosine itself is an Arrow-vectorized
pandas_udf (numpy row-block arithmetic): Spark evaluates higher-order
array expressions (`zip_with`/`aggregate`) INTERPRETED, outside
codegen, which measured ~5× slower than the Arrow round-trip on
64-dim vectors. The bucket/cell joins stay JVM-side.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.types import DoubleType


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


@F.pandas_udf(DoubleType())
def _cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    if not len(a):
        return pd.Series([], dtype="float64")
    # np.stack over the per-row ndarrays — no .tolist() boxing (the
    # sf1 probe measured x5's 8M-pair batch at 36 s, dominated by
    # boxing 1B floats through Python lists)
    x = np.stack(a.values).astype(np.float64, copy=False)
    y = np.stack(b.values).astype(np.float64, copy=False)
    c = (x * y).sum(axis=1) / (
        np.sqrt((x * x).sum(axis=1)) * np.sqrt((y * y).sum(axis=1)))
    # HALF_UP to 6dp, matching F.round / DuckDB ROUND
    return pd.Series(np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6)


def with_cosine(df: DataFrame, a_col: str, b_col: str,
                out_col: str = "cosine") -> DataFrame:
    """cos(a, b) in float64, rounded HALF_UP to 6dp. Requires uniform
    vector length within each column (embedding dims are fixed)."""
    return df.withColumn(out_col, _cosine_udf(F.col(a_col), F.col(b_col)))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine",
                F.col("rank").cast("long").alias("rank"))
    )


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                max_driver_rows: int | None = None) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each query vector.
    `queries` is (query_id, query_vec); the query matrix is broadcast
    as numpy, the corpus streams through ONE BLAS-scored map stage
    that emits only each query's per-partition top-k partials, and
    the final rank is a window over |queries|·k·partitions rows —
    never a corpus×queries row exchange (the previous crossJoin form
    materialized both 64-float arrays on every scored row: 4 GB and
    29 s at the local sf1 probe for 8M pairs; this form is one corpus
    scan). Tie-breaks replay (cosine desc @6dp HALF_UP, neighbor_id
    asc) exactly: corpus batches are pre-sorted by neighbor id and a
    stable argsort of -cosine inherits the id order.

    The QUERY side is collected to the driver and broadcast at
    plan-build time (an eager Spark job — compose accordingly), so it
    is ceiling-guarded like every sanctioned driver materialization: a
    query set above ``max_driver_rows`` (default
    ``guards.DRIVER_ROWS_CEILING``) raises with a pointer at the
    distributed siblings instead of silently OOMing the driver."""
    from data_ingest_spark.operators.guards import assert_driver_ceiling
    assert_driver_ceiling(
        queries, "broadcast-query exact ANN (cosine_topk)",
        "cosine_topk_lsh / cosine_topk_ivf (bucketed cell joins) for "
        "corpus-sized query sets", max_driver_rows)
    q_tbl = queries.select("query_id", "query_vec").toArrow()
    import pyarrow.compute  # noqa: F401  (ensure compute kernels)
    qids = np.asarray(q_tbl.column("query_id").to_pylist())
    nq = len(qids)
    spark = emb.sparkSession
    if not nq:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, "
                "rank long")
    qflat = np.asarray(q_tbl.column("query_vec").combine_chunks()
                       .flatten(), dtype=np.float64)
    qmat = qflat.reshape(nq, -1)
    q_norms = np.sqrt((qmat * qmat).sum(axis=1))
    bc = spark.sparkContext.broadcast((qids, qmat, q_norms))
    kk = k

    def fn(batches):
        qids_, qmat_, qn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf["neighbor_id"].to_numpy()
            order = np.argsort(nids, kind="stable")
            nids = nids[order]
            m = np.stack(pdf["_v"].values[order]).astype(np.float64,
                                                         copy=False)
            # dot-then-divide, the knn_exact float path the oracle
            # replays (NOT pre-normalized vectors — a different
            # summation path could flip a 6dp rounding boundary)
            sim = m @ qmat_.T                      # (batch, nq)
            sim /= np.outer(np.sqrt((m * m).sum(axis=1)), qn_)
            sim = np.sign(sim) * np.floor(np.abs(sim) * 1e6 + 0.5) / 1e6
            # self-exclusion
            eq = nids[:, None] == qids_[None, :]
            sim[eq] = -np.inf
            take = min(kk, sim.shape[0])
            sel = np.argsort(-sim, axis=0, kind="stable")[:take]
            cos = np.take_along_axis(sim, sel, axis=0)
            keep = np.isfinite(cos.ravel())
            yield pd.DataFrame({
                "query_id": np.tile(qids_, take)[keep],
                "neighbor_id": nids[sel.ravel()][keep],
                "cosine": cos.ravel()[keep]})

    partials = (emb.select(F.col(id_col).alias("neighbor_id"),
                           _dvec(F.col(vec_col)).alias("_v"))
                .mapInPandas(fn, "query_id long, neighbor_id long, "
                                 "cosine double"))
    return _rank_topk(partials, k)


def cosine_topk_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cell_col: str = "label") -> DataFrame:
    """IVF top-k: each query only scans its own coarse cell (nprobe=1).
    `queries` is (query_id, query_vec, <cell_col>). The equi-join on
    the cell makes the scan N/cells per query and shuffle-partitioned
    by cell — the 1000-executor shape for ANN at corpus scale."""
    scored = with_cosine(
        emb.select(F.col(id_col).alias("neighbor_id"), vec_col, cell_col)
        .join(F.broadcast(queries), cell_col),
        "query_vec", vec_col,
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    return _rank_topk(scored, k)


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: weight (j, i) is the
    first md5 nibble of "j|i", centered (−7.5..7.5). Fixed data —
    identical constants can be inlined into an oracle query."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
            row.append(int(h[0], 16) - 7.5)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket string from fixed hyperplanes: bit j is 1 iff
    plane_j · v > 0."""
    v = _dvec(F.col(vec_col))
    bits = []
    for row in planes:
        w = F.array(*[F.lit(x) for x in row])
        bits.append(F.when(_dot(w, v) > 0, "1").otherwise("0"))
    return F.concat(*bits)


def cosine_topk_lsh(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 4, dim: int = 64) -> DataFrame:
    """LSH-bucketed top-k: corpus and queries are bucketed by the sign
    pattern of fixed random hyperplanes; each query scans one bucket
    (~N/2^planes). Approximate — recall loss at bucket boundaries is
    the standard LSH trade-off; `cosine_topk` is the exact verifier."""
    planes = hyperplanes(n_planes, dim)
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), vec_col,
        lsh_bucket_col(vec_col, planes).alias("_bkt"))
    q = queries.withColumn("_bkt", lsh_bucket_col("query_vec", planes))
    scored = with_cosine(
        corpus.join(F.broadcast(q), "_bkt"), "query_vec", vec_col,
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    return _rank_topk(scored, k)


def embedding_near_dups(emb: DataFrame, threshold: float = 0.9,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        n_planes: int = 4, dim: int = 64) -> DataFrame:
    """(id_a, id_b, cosine) — embedding-cosine near-duplicate pairs,
    id_a < id_b, cosine ≥ threshold. The candidate set is the LSH
    bucket self-join (same deterministic hyperplanes as
    cosine_topk_lsh), never all-pairs: at corpus scale work is
    Σ bucket², tunable with n_planes. Like every LSH method, recall
    < 1 for pairs split across a boundary — raise n_planes and union
    rotations, or drop to cosine_topk for the exact verifier."""
    planes = hyperplanes(n_planes, dim)
    keyed = emb.select(F.col(id_col), F.col(vec_col),
                       lsh_bucket_col(vec_col, planes).alias("_bkt"))
    a = keyed.select(F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("_va"), "_bkt")
    b = keyed.select(F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("_vb"), "_bkt")
    pairs = a.join(b, "_bkt").filter(F.col("id_a") < F.col("id_b"))
    return (with_cosine(pairs, "_va", "_vb")
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def kmeans_ivf_index(emb: DataFrame, n_cells: int = 8, seed: int = 11,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """Train a real IVF coarse quantizer: Spark ML KMeans centroids
    over the corpus, every vector assigned to its nearest centroid.
    Returns (assigned_df with `ivf_cell`, model). The production ANN
    index build: the KMeans fit is a distributed Lloyd's iteration
    (treeAggregate per step), assignment is one map-side pass, and the
    index persists as a plain column — re-partition/bucket by
    `ivf_cell` to co-locate each cell's postings at 100 TB."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.withColumn("_fv", array_to_vector(
        F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_fv",
                   predictionCol="ivf_cell").fit(feat)
    return model.transform(feat).drop("_fv"), model


def cosine_topk_kmeans_ivf(emb: DataFrame, query_ids: list[int],
                           k: int = 5, n_cells: int = 8, nprobe: int = 2,
                           seed: int = 11, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """End-to-end KMeans-IVF search with nprobe > 1: queries scan
    their `nprobe` nearest centroid cells only. Centroids live on the
    driver (n_cells × dim — tiny); cell membership joins
    shuffle-partitioned by cell. The recall/cost dial is
    (n_cells, nprobe) — the standard IVF trade-off."""
    import numpy as np

    assigned, model = kmeans_ivf_index(emb, n_cells, seed, id_col, vec_col)
    centers = np.vstack([c for c in model.clusterCenters()])

    qvecs = (emb.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).alias("query_vec")).collect())
    probe_rows = []
    for r in qvecs:
        v = np.asarray(r["query_vec"], dtype=float)
        d = ((centers - v) ** 2).sum(axis=1)
        for cell in np.argsort(d)[:nprobe]:
            probe_rows.append((r["query_id"], list(map(float, v)),
                               int(cell)))
    spark = emb.sparkSession
    from data_ingest_spark.functions.localrel import arrow_local_df
    probes = arrow_local_df(
        spark, probe_rows,
        "query_id long, query_vec array<double>, ivf_cell int",
        ["query_id", "query_vec", "ivf_cell"])

    scored = with_cosine(
        assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col), "ivf_cell")
        .join(F.broadcast(probes), "ivf_cell"),
        "query_vec", vec_col,
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    return _rank_topk(scored.drop("ivf_cell"), k)


PQ_SUBSPACES, PQ_CODEWORDS = 8, 16


def pq_codebooks(dim: int = 64, m: int = PQ_SUBSPACES,
                 ncodes: int = PQ_CODEWORDS) -> list:
    """Deterministic PQ codebooks: entry (j, c, i) is the first md5
    nibble of "j|c|i", centered — fixed constants both engines can
    inline (the production path trains these with per-subspace KMeans;
    the codebook CONTRACT — m subspaces × ncodes centroids — is what
    matters to the encoder)."""
    sub = dim // m
    books = []
    for j in range(m):
        rows = []
        for c in range(ncodes):
            rows.append([
                int(hashlib.md5(f"{j}|{c}|{i}".encode())
                    .hexdigest()[0], 16) - 7.5
                for i in range(sub)])
        books.append(rows)
    return books


def pq_encode(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", dim: int = 64,
              m: int = PQ_SUBSPACES,
              ncodes: int = PQ_CODEWORDS) -> DataFrame:
    """Product-quantization encoding: each vector → ``m`` 4-bit codes
    (argmax of the rounded similarity score ``2·v_j·cb − ‖cb‖²`` per
    subspace, ties to the smallest codeword). 64 floats compress to
    8 nibbles — the memory layout that lets an ANN index hold billions
    of vectors in RAM; distance queries then use per-subspace lookup
    tables instead of float vectors.

    numpy over Arrow batches, map-only (no shuffle); scores rounded
    6dp before the argmax so the codes are bit-identical to the SQL
    oracle (the x5-family dot-product parity pattern)."""
    import numpy as np
    books = pq_codebooks(dim, m, ncodes)
    sub = dim // m
    cb = np.asarray(books)                       # (m, ncodes, sub)
    norm2 = (cb * cb).sum(axis=2)                # (m, ncodes)

    def fn(batches):
        for pdf in batches:
            ids, codes = [], []
            for vid, v in zip(pdf[id_col], pdf[vec_col]):
                x = np.asarray(v, dtype=np.float64)
                row = []
                for j in range(m):
                    seg = x[j * sub:(j + 1) * sub]
                    score = 2.0 * (cb[j] @ seg) - norm2[j]
                    score = np.floor(score * 1e6 + 0.5) / 1e6
                    row.append(int(np.argmax(score)))
                ids.append(int(vid))
                codes.append(",".join(str(c) for c in row))
            import pandas as pd
            yield pd.DataFrame({"vec_id": ids, "pq_code": codes})

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("vec_id", LongType()),
                         StructField("pq_code", StringType())])
    return emb.select(id_col, vec_col).mapInPandas(fn, schema)


def pq_search(emb: DataFrame, query_ids: list[int], k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = 64, m: int = PQ_SUBSPACES,
              ncodes: int = PQ_CODEWORDS) -> DataFrame:
    """Asymmetric-distance PQ search: queries keep their full vectors,
    candidates are scored from their 4-bit codes via per-subspace
    lookup tables — the RAM-resident scoring mode of every large-scale
    ANN system (pair with the IVF cell filter to prune the scan).

    LUT entries are fix-pointed (round(score·1e6) as int64) so the
    8-term candidate score is an exact integer sum — bit-identical to
    the SQL oracle. The LUT is (n_queries × m × ncodes) ints — tiny,
    shipped in the closure; codes scan map-only, then one top-k."""
    import numpy as np
    books = pq_codebooks(dim, m, ncodes)
    sub = dim // m
    cb = np.asarray(books)
    norm2 = (cb * cb).sum(axis=2)

    qrows = (emb.filter(F.col(id_col).isin(query_ids))
             .select(id_col, vec_col).collect())
    luts = {}
    for r in qrows:
        x = np.asarray(r[vec_col], dtype=np.float64)
        lut = np.empty((m, ncodes), dtype=np.int64)
        for j in range(m):
            seg = x[j * sub:(j + 1) * sub]
            score = 2.0 * (cb[j] @ seg) - norm2[j]
            lut[j] = np.floor(score * 1e6 + 0.5)
        luts[int(r[id_col])] = lut

    codes = pq_encode(emb, id_col, vec_col, dim, m, ncodes)

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            out = {"query_id": [], "neighbor_id": [], "score_i": []}
            for vid, code in zip(pdf["vec_id"], pdf["pq_code"]):
                cs = [int(c) for c in code.split(",")]
                for qid, lut in luts.items():
                    if int(vid) == qid:
                        continue
                    s = int(sum(lut[j][cs[j]] for j in range(m)))
                    out["query_id"].append(qid)
                    out["neighbor_id"].append(int(vid))
                    out["score_i"].append(s)
            yield pd.DataFrame(out)

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([StructField("query_id", LongType()),
                         StructField("neighbor_id", LongType()),
                         StructField("score_i", LongType())])
    scored = codes.mapInPandas(fn, schema)
    w = W.partitionBy("query_id").orderBy(F.col("score_i").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score_i",
                    F.col("rank").cast("long").alias("rank")))


def quantize_int8(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization with a per-vector scale: scale =
    round(max|v|/127, 6); q_i = half-up-round(v_i/scale) clamped to
    [-127, 127] — 4× smaller embeddings for storage/serving, dims
    preserved (vs PQ's codebook compression). Emitted as
    ``(vec_id, scale, q_csv, max_err)``: max_err is the worst absolute
    reconstruction error, the quality audit a serving deploy gates on.

    Column-land and deterministic: the scale is rounded before the
    divide so both engines quantize identical doubles; all outputs are
    ints or 6dp-rounded. Map-only — no shuffle at any size."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.round(amax / F.lit(127.0), 6)
    q = F.transform(
        v, lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / scale + 0.5))))
    err = F.round(F.array_max(F.zip_with(
        v, q, lambda x, qi: F.abs(x - qi * scale))), 6)
    return emb.select(
        F.col(id_col),
        scale.alias("scale"),
        F.concat_ws(",", F.transform(
            q, lambda x: x.cast("long").cast("string"))).alias("q_csv"),
        err.alias("max_err"))


def lloyd_step(emb: DataFrame, k: int = 4, id_col: str = "vec_id",
               vec_col: str = "embedding", scale: int = 10**6) -> DataFrame:
    """One exact Lloyd (k-means) iteration in fixed-point integer
    arithmetic — the distributed coarse-quantizer refinement step
    behind :func:`kmeans_ivf_index`, made hash-checkable.

    Seeding is deterministic (rows with ``id < k`` are the initial
    centroids — ids here are dense 0-based, so that IS the k smallest;
    pass a pre-densified id for sparse id spaces. Real data vectors,
    so quantized distances are exact
    int64: |q| ≲ 2e6 ⇒ Σ₆₄ diff² < 3e14). Each vector assigns to the
    argmin-distance centroid (ties → smallest centroid id) and the new
    centroid is the per-dimension integer mean, emitted as
    ``(cid, dim, n, mean_q)``.

    Plan: the k centroid rows broadcast; assignment is a map-side
    zip_with/aggregate fold (whole-stage codegen, no UDF); the
    re-centering is one partial-aggregated groupBy on (cid, dim) —
    two shuffles total, independent of corpus size. Iterating the
    step is the full Lloyd loop; each pass stays O(corpus)/shuffle."""
    q = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * scale)
                    .cast("long")).alias("qe"))
    cent = q.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col("qe").alias("ce"))
    d = (q.join(F.broadcast(cent))
         .withColumn("d2", F.aggregate(
             F.zip_with("qe", "ce", lambda a, b: (a - b) * (a - b)),
             F.lit(0).cast("long"), lambda acc, x: acc + x)))
    w = W.partitionBy(id_col).orderBy("d2", "cid")
    assign = (d.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") == 1)
              .select(id_col, "cid", "qe"))
    x = assign.select("cid", F.posexplode("qe").alias("dim", "val"))
    return (x.groupBy("cid", "dim")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("val").alias("s"))
            .select("cid", (F.col("dim") + 1).cast("int").alias("dim"),
                    "n", F.round(F.col("s") / F.col("n"), 6).alias("mean_q")))


def hard_negatives(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", label_col: str = "label",
                   k: int = 1,
                   max_driver_rows: int | None = None) -> DataFrame:
    """Hard-negative mining for embedding/retriever training: for each
    vector, the ``k`` most-cosine-similar vectors carrying a DIFFERENT
    label — the negatives that actually move a contrastive loss.
    Returns ``(vec_id, neg_id, cosine, rank)``.

    Exact variant via the ``cosine_topk`` broadcast-matrix shape: the
    table (every vector is a query) is collected once, broadcast as
    numpy, and the corpus streams through ONE BLAS-scored map stage
    that masks same-label (and either-NULL-label, matching SQL
    ``a.label <> b.label``) pairs and emits per-query per-partition
    top-k partials; the shuffles are a corpus repartition feeding the
    map (parallelism, not data movement) and the final rank window
    over |corpus|·k·partitions rows. The previous broadcast-NLJ form
    materialized every label-mismatched PAIR as a row and paid a
    64-element interpreted fold per pair — ~300M pair rows and >12
    min at the local sf1 probe (20k vectors); this form measures
    6.0 s there. Rounding/tie-break contract unchanged: rank on
    cosine at 6dp HALF_UP descending, neighbor id ascending.

    The plan-build collect is ceiling-guarded like every sanctioned
    driver materialization; above ``max_driver_rows`` (default
    ``guards.DRIVER_ROWS_CEILING``) use the LSH/IVF bucketed
    candidate generation in this module — the label-exclusion ranking
    composes the same way."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    from data_ingest_spark.operators.guards import assert_driver_ceiling
    assert_driver_ceiling(
        emb.select(id_col), "broadcast-table hard-negative mining "
        "(hard_negatives)",
        "cosine_topk_lsh / cosine_topk_ivf bucketed candidates + a "
        "label-exclusion rank for corpus-sized inputs", max_driver_rows)
    q_tbl = (emb.select(F.col(id_col).alias("_qid"),
                        F.col(label_col).alias("_qlab"),
                        _dvec(F.col(vec_col)).alias("_qv"))
             .toArrow())
    spark = emb.sparkSession
    id_type = emb.schema[id_col].dataType
    out_schema = StructType([
        StructField(id_col, id_type),
        StructField("neg_id", id_type),
        StructField("cosine", DoubleType()),
    ])
    qids = np.asarray(q_tbl.column("_qid").to_pylist())
    qlab_cat = pd.Categorical(q_tbl.column("_qlab").to_pylist())
    nq = len(qids)
    if not nq:
        return spark.createDataFrame([], out_schema).withColumn(
            "rank", F.lit(1).cast("int"))
    qflat = np.asarray(q_tbl.column("_qv").combine_chunks().flatten(),
                       dtype=np.float64)
    qmat = qflat.reshape(nq, -1)
    q_norms = np.sqrt((qmat * qmat).sum(axis=1))
    # labels as int codes (NULL -> -1): the mask compare below is then
    # a C int broadcast, not |batch|x|nq| Python-object __eq__ calls.
    # The categories are complete (the q side IS the full table), so a
    # corpus label never falls outside them.
    qcodes = np.asarray(qlab_cat.codes, dtype=np.int32)
    bc = spark.sparkContext.broadcast(
        (qids, qcodes, list(qlab_cat.categories), qmat, q_norms))
    kk = k

    def fn(batches):
        qids_, qcodes_, qcats_, qmat_, qn_ = bc.value
        qnull_ = qcodes_ < 0
        qinv_ = 1.0 / qn_
        for pdf in batches:
            if not len(pdf):
                continue
            nids = pdf["_nid"].to_numpy()
            ncodes = np.asarray(
                pd.Categorical(pdf["_nlab"], categories=qcats_).codes,
                dtype=np.int32)
            nnull = ncodes < 0
            m = np.stack(pdf["_nv"].values).astype(np.float64, copy=False)
            inv_mn = 1.0 / np.sqrt((m * m).sum(axis=1))
            rows = m.shape[0]
            take = min(kk, rows)
            # query columns in chunks: bounds the sim tile at
            # rows x 4096 however large the (corpus-sized) query
            # matrix is
            for c0 in range(0, len(qids_), 4096):
                c1 = min(c0 + 4096, len(qids_))
                sim = m @ qmat_[c0:c1].T            # (rows, chunk)
                sim *= inv_mn[:, None]
                sim *= qinv_[None, c0:c1]
                # HALF_UP 6dp BEFORE ranking (module convention):
                # sign*floor(|x|*1e6 + 0.5)/1e6, with the sign carried
                # as a bool mask + masked negate (np.sign materializes
                # a full float tile and is pathologically slow in this
                # numpy build — measured 14 s on an 82M tile vs 0.2 s
                # for the compare)
                neg = sim < 0
                np.abs(sim, out=sim)
                sim *= 1e6
                sim += 0.5
                np.floor(sim, out=sim)
                sim /= 1e6
                np.negative(sim, out=sim, where=neg)
                # SQL `a.label <> b.label`: equal labels AND NULL-on-
                # either-side pairs are not candidates. Zero-norm
                # vectors (NaN cosine) are cleaned to -inf here too so
                # the argmax scan below never sees a NaN (numpy argmax
                # treats NaN as maximal, which would poison whole
                # columns).
                sim[(ncodes[:, None] == qcodes_[None, c0:c1])
                    | nnull[:, None] | qnull_[None, c0:c1]
                    | ~np.isfinite(sim)] = -np.inf
                # Per-query-column top-k SUPERSET: `take` rounds of
                # argmax-and-blank (argmax is a fast streaming
                # reduction; this build's argpartition/argsort run at
                # ~4M elts/s and dominated the first cut of this
                # rewrite), then keep every row with sim >= the
                # take-th value. Boundary ties are all kept — the
                # final rank window applies the exact (cosine desc,
                # id asc) order, so partials only need to be
                # supersets. Blanked cells are restored before the
                # final compare.
                cols = np.arange(c1 - c0)
                hits, kth = [], None
                for _ in range(take):
                    am = np.argmax(sim, axis=0)
                    kth = sim[am, cols]
                    hits.append((am, kth.copy()))
                    sim[am, cols] = -np.inf
                for am, vals in hits:
                    sim[am, cols] = vals
                mask = sim >= kth[None, :]
                mask &= sim > -np.inf
                ri, ci = np.nonzero(mask)
                yield pd.DataFrame({
                    id_col: qids_[c0 + ci],
                    "neg_id": nids[ri],
                    "cosine": sim[ri, ci]})

    # Spread the corpus scan to full parallelism before the scored
    # map (the knn_exact r8 lesson: a small parquet arrives as 1-2
    # splits, and O(N·Q) scoring on one core is the whole wall —
    # 127 s vs ~8 s at the local sf1 probe). The exchange carries
    # only (id, label, vector) rows, negligible next to the scoring
    # it parallelizes.
    partials = (emb.select(F.col(id_col).alias("_nid"),
                           F.col(label_col).alias("_nlab"),
                           _dvec(F.col(vec_col)).alias("_nv"))
                .repartition(spark.sparkContext.defaultParallelism)
                .mapInPandas(fn, out_schema))
    w = W.partitionBy(id_col).orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .withColumn("rank", F.col("rank").cast(IntegerType())))


def _fixed_vec(col, scale: int):
    """Fixed-point int64 quantization of a float vector column."""
    return F.transform(col, lambda x: F.round(x.cast("double") * scale)
                       .cast("long"))


def _d2_fold(a, b):
    """Exact int64 squared Euclidean distance between two quantized
    vectors (codegen zip_with/aggregate fold, no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0).cast("long"), lambda acc, x: acc + x)


def _cell_scores(cents_col, qe_col):
    """Per-centroid (d2, cid) structs for one vector — struct order =
    (distance, centroid id), the deterministic argmin tie-break."""
    return F.transform(cents_col, lambda c: F.struct(
        _d2_fold(qe_col, c["ce"]).alias("d2"), c["cid"].alias("cid")))


def lloyd_centroids(emb: DataFrame, k: int = 4, n_iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    scale: int = 10**6) -> DataFrame:
    """``n_iters`` exact fixed-point Lloyd iterations; returns the
    final centroid table ``(cid, ce: array<long>)``.

    The deterministic, hash-checkable sibling of the Spark ML fit in
    :func:`kmeans_ivf_index`: seeds are rows with dense ``id < k``,
    every vector is quantized to int64 (×``scale``), assignment is an
    exact integer argmin (ties → smallest cid), and the centroid
    update is ``floor(sum / n)`` — the one shared double op, identical
    IEEE semantics in any engine, so a SQL oracle can unroll the same
    ``n_iters`` rounds and match bit-for-bit.

    Plan (r10 rewrite, guide §4/§5): quantization stays a plan-side
    fold (value parity with the SQL oracle by construction), but each
    round's assignment + per-cell partial sums run as int64 numpy
    inside ONE mapInPandas corpus pass (`_lloyd_assign_partials` —
    exact integer argmin, ties to the smallest cid, identical to the
    former interpreted `_cell_scores` fold), emitting k·dim partial
    rows per task that are summed in one fixed-size groupBy and
    collected; the centroid matrix ships in the task closure (k·dim
    ints — driver-sized by construction). floor(sum/count) happens on
    the driver with the same IEEE double ops Spark's
    floor(cast(long as double)/...) performs. One Spark job per
    iteration, zero broadcast builds, zero checkpoints — the r9 form
    paid a collect_list aggregate job, a broadcast exchange AND a
    blocking eager localCheckpoint per round, plus an interpreted
    per-row d2 fold over every (vector, centroid) pair. Identical
    values: pinned by the x51 oracle, which unrolls the same rounds
    in SQL."""
    from data_ingest_spark.functions.localrel import arrow_local_df
    rows = lloyd_centroid_rows(emb, k, n_iters, id_col, vec_col, scale)
    return arrow_local_df(emb.sparkSession, rows,
                          "cid long, ce array<bigint>", ["cid", "ce"])


def _cent_arrays(cent_rows: list[tuple[int, list[int]]]):
    """(cids int64[k], centers int64[k×dim]) sorted by cid — numpy form
    of the centroid list; argmin over rows then replays the
    (d2, cid)-struct array_min tie-break exactly."""
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    mat = np.array([ce for _, ce in cent_rows], dtype=np.int64)
    order = np.argsort(cids, kind="stable")
    return cids[order], mat[order]


def _lloyd_assign_partials(q_df, cent_rows):
    """One corpus pass: exact int64 nearest-centroid assignment (argmin
    of Σ(qe−ce)², ties to the smallest cid) + per-(cell, dim) partial
    sums and counts in numpy; k·dim partial rows leave each task."""
    cids, mat = _cent_arrays(cent_rows)
    kk, dim = mat.shape

    def fn(batches):
        sums = np.zeros((kk, dim), dtype=np.int64)
        cnts = np.zeros(kk, dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            qe = np.stack(pdf["qe"].values).astype(np.int64, copy=False)
            d = qe[:, None, :] - mat[None, :, :]
            d2 = (d * d).sum(axis=2)              # exact int64
            a = d2.argmin(axis=1)                 # first min = smallest cid
            np.add.at(sums, a, qe)
            cnts += np.bincount(a, minlength=kk)
            seen = True
        if seen:
            idx = np.arange(kk)
            yield pd.DataFrame({
                "cid": np.repeat(cids, dim),
                "dim": np.tile(np.arange(dim, dtype=np.int64), kk),
                "s": sums.reshape(-1),
                "n": np.repeat(cnts, dim)})

    return (q_df.select("qe")
            .mapInPandas(fn, "cid long, dim long, s long, n long")
            .groupBy("cid", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n")))


def lloyd_centroid_rows(emb: DataFrame, k: int = 4, n_iters: int = 2,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        scale: int = 10**6) -> list[tuple[int, list[int]]]:
    """Driver-side form of :func:`lloyd_centroids`: the sorted
    ``(cid, ce)`` list after ``n_iters`` rounds. Every per-round
    artifact that crosses to the driver is k·dim fixed-size; the
    corpus-sized work (assignment + per-cell partial sums) stays
    distributed."""
    import math
    q = emb.select(F.col(id_col),
                   _fixed_vec(F.col(vec_col), scale).alias("qe"))
    cent = sorted(
        (int(r["cid"]), [int(x) for x in r["ce"]])
        for r in q.filter(F.col(id_col) < k)
                  .select(F.col(id_col).cast("long").alias("cid"),
                          F.col("qe").alias("ce")).collect())
    for _ in range(n_iters):
        if not cent:
            break
        upd = _lloyd_assign_partials(q, cent).collect()
        acc: dict = {}
        for r in upd:
            if r["n"]:
                acc[(r["cid"], r["dim"])] = (r["s"], r["n"])
        ndim = len(cent[0][1])
        # floor(sum / count) in double — float(int) and the division
        # are the identical IEEE ops Spark's cast(long as double) /
        # floor perform, so the values match the r9 distributed form
        cent = [(cid, [int(math.floor(float(acc[(cid, d)][0])
                                      / float(acc[(cid, d)][1])))
                       for d in range(ndim)])
                for cid in sorted({c for c, _ in acc})]
    return cent


def cosine_topk_fixed_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
                          n_cells: int = 4, n_iters: int = 2,
                          nprobe: int = 2, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          scale: int = 10**6,
                          max_driver_rows: int | None = None) -> DataFrame:
    """End-to-end IVF ANN whose coarse quantizer is the deterministic
    :func:`lloyd_centroids` fit — the whole index build AND search is
    exactly reproducible in SQL (unroll the same ``n_iters`` Lloyd
    rounds), so unlike the Spark-ML-trained variant this query carries
    a full value oracle. ``queries`` is ``(query_id, query_vec)``.

    Plan (r10 rewrite, guide §4): ONE corpus map stage does both the
    exact int64 nearest-cell assignment (numpy argmin over the
    closure-shipped k×dim centroid matrix — the same (d2, cid)
    ordering the former interpreted `_cell_scores` fold produced) and
    the BLAS cosine scoring against the per-cell probe matrices; only
    per-query per-batch top-k partials leave the stage, and the only
    corpus-sized shuffle is the final rank window. Probing (nprobe
    nearest cells per query) happens on the driver over the collected
    query table — the same table this function always collected for
    the probe broadcast. Cosine stays dot/(|a|·|b|), 6dp HALF_UP
    before ranking, tie-break (cosine desc, neighbor asc) — the
    oracle replays identically.

    The QUERY table is collected to the driver at plan-build time (an
    eager Spark job), so it is ceiling-guarded: the guard divides the
    row ceiling (``max_driver_rows``, default
    ``guards.DRIVER_ROWS_CEILING``) by ``nprobe`` — what lands on the
    driver is the probe-exploded footprint — and raises with a
    pointer at the fully-distributed cell-join siblings."""
    from data_ingest_spark.operators.guards import (DRIVER_ROWS_CEILING,
                                                    assert_driver_ceiling)
    lim = DRIVER_ROWS_CEILING if max_driver_rows is None else max_driver_rows
    assert_driver_ceiling(
        queries, "broadcast-probe fixed-IVF ANN (cosine_topk_fixed_ivf)",
        "cosine_topk_ivf / cosine_topk_kmeans_ivf (distributed cell "
        "joins) for corpus-sized query sets", max(lim // max(nprobe, 1), 1))
    spark = emb.sparkSession

    def _empty() -> DataFrame:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, "
                "rank long")

    cent_rows = lloyd_centroid_rows(emb, n_cells, n_iters, id_col,
                                    vec_col, scale)
    if not cent_rows:
        return _empty()
    cids, mat = _cent_arrays(cent_rows)
    # probe selection on the driver: quantization stays a plan-side
    # fold (parity by construction); the nprobe cells per query are
    # the first nprobe of the exact (d2, cid)-ascending order — the
    # array_sort(slice(...)) the r9 plan evaluated per probe row
    pq = (queries.withColumn("qe", _fixed_vec(F.col("query_vec"), scale))
          .select("query_id", "query_vec", "qe").toArrow())
    if not pq.num_rows:
        return _empty()
    p_qid = np.asarray(pq.column("query_id").to_pylist())
    p_mat = np.asarray(pq.column("query_vec").combine_chunks()
                       .flatten(), dtype=np.float64).reshape(
        pq.num_rows, -1)
    p_qe = np.asarray(pq.column("qe").to_pylist(), dtype=np.int64)
    by_cell: dict = {}
    for i in range(pq.num_rows):
        d = p_qe[i][None, :] - mat
        d2 = (d * d).sum(axis=1)
        for j in np.lexsort((cids, d2))[:nprobe]:
            by_cell.setdefault(int(cids[j]), []).append(i)
    for cid, idxs in list(by_cell.items()):
        qm = p_mat[idxs]
        by_cell[cid] = (p_qid[idxs], qm, np.sqrt((qm * qm).sum(axis=1)))
    bc = spark.sparkContext.broadcast(by_cell)
    kk = k
    a_cids, a_mat = cids, mat

    def fn(batches):
        cells = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            qe = np.stack(pdf["qe"].values).astype(np.int64, copy=False)
            d = qe[:, None, :] - a_mat[None, :, :]
            assign = a_cids[(d * d).sum(axis=2).argmin(axis=1)]
            all_nids = pdf["neighbor_id"].to_numpy()
            out = []
            for cid in np.unique(assign):
                cell = cells.get(int(cid))
                if cell is None:
                    continue
                qids_, qmat_, qn_ = cell
                rows = np.flatnonzero(assign == cid)
                nids = all_nids[rows]
                order = np.argsort(nids, kind="stable")
                nids = nids[order]
                m = np.stack(pdf["_v"].values[rows[order]]).astype(
                    np.float64, copy=False)
                sim = m @ qmat_.T
                sim /= np.outer(np.sqrt((m * m).sum(axis=1)), qn_)
                sim = np.sign(sim) * np.floor(
                    np.abs(sim) * 1e6 + 0.5) / 1e6
                sim[nids[:, None] == qids_[None, :]] = -np.inf
                take = min(kk, sim.shape[0])
                selr = np.argsort(-sim, axis=0, kind="stable")[:take]
                cos = np.take_along_axis(sim, selr, axis=0)
                keep = np.isfinite(cos.ravel())
                out.append(pd.DataFrame({
                    "query_id": np.tile(qids_, take)[keep],
                    "neighbor_id": nids[selr.ravel()][keep],
                    "cosine": cos.ravel()[keep]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    partials = (emb
                .select(F.col(id_col).alias("neighbor_id"),
                        _fixed_vec(F.col(vec_col), scale).alias("qe"),
                        _dvec(F.col(vec_col)).alias("_v"))
                .mapInPandas(fn, "query_id long, neighbor_id long, "
                                 "cosine double"))
    return _rank_topk(partials, k)


#: LCG used to derive the deterministic +/-1 projection matrix. Bit 16
#: is the sign source: the low bit of an LCG with odd multiplier and
#: increment strictly alternates, so it must not be used.
_RP_A, _RP_C, _RP_M = 1103515245, 12345, 2**31


def rp_sign(idx: int) -> int:
    """+1/-1 from bit 16 of one LCG step — pure integer arithmetic,
    reproducible verbatim in SQL for the oracle."""
    return 1 if ((_RP_A * idx + _RP_C) % _RP_M) // 65536 % 2 == 1 else -1


def random_projection_fixed(emb: DataFrame, in_dim: int = 64,
                            out_dim: int = 8, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            scale: int = 10**6) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a sign matrix
    (Achlioptas ±1 variant) — the cheap dimensionality-reduction
    front end for sketch-based similarity at 100 TB. The projection
    matrix is derived from an LCG (``rp_sign``), never materialized
    driver-side, and identical in the SQL oracle; inputs quantize to
    fixed-point int64 (floor(x·scale + 0.5)) so every output
    component is an exact integer sum — hash-stable across engines
    and across partitionings (integer addition commutes).

    Returns ``(vec_id, dim, component)`` long-form rows.

    Plan shape: map-only — the ±1 constants fold into the codegen'd
    aggregate expression per output dim; no shuffle, no UDF, output
    is ``out_dim`` rows per vector via one posexplode."""
    q = F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.floor(x * scale + F.lit(0.5)))
    comps = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(rp_sign(i * out_dim + j))
                          for i in range(in_dim)])
        comps.append(F.aggregate(
            F.zip_with(F.col("_q"), signs, lambda x, s: x * s),
            F.lit(0).cast("long"), lambda acc, v: acc + v))
    return (emb.select(F.col(id_col), q.alias("_q"))
            .select(id_col, F.posexplode(F.array(*comps))
                    .alias("dim", "component"))
            .select(id_col, F.col("dim").cast("int").alias("dim"),
                    F.col("component").cast("long").alias("component")))


def pc1_moment_rows(emb: DataFrame, dim: int = 64,
                    vec_col: str = "embedding",
                    q_scale: int = 10**3) -> DataFrame:
    """ONE corpus pass producing everything :func:`power_iteration_pc1`
    needs: the raw second-moment matrix Σ q qᵀ (rows ``(j, k, _p)`` for
    j,k ∈ [0, dim)), the per-dimension column sums (marker band
    ``j = -1``), and the row count (marker ``j = k = -2``) — int64 BLAS
    per partition via Arrow, dim² + dim + 1 partial rows per task into
    one fixed-size groupBy. The r9 form paid a SECOND corpus pass for
    the count/colsum aggregate; folding them into the same mapInPandas
    partials halves the corpus I/O."""
    q = F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.floor(x * q_scale + F.lit(0.5)))
    rows = emb.select(q.alias("_q"))

    def fn(batches):
        import numpy as np
        import pandas as pd
        acc = np.zeros((dim, dim), dtype=np.int64)
        cs = np.zeros(dim, dtype=np.int64)
        cnt = 0
        for pdf in batches:
            if len(pdf):
                m = np.stack(pdf["_q"].values).astype(np.int64, copy=False)
                acc += m.T @ m
                cs += m.sum(axis=0)
                cnt += len(pdf)
        if cnt:
            idx = np.arange(dim, dtype=np.int64)
            yield pd.DataFrame({
                "j": np.concatenate([np.repeat(idx, dim),
                                     np.full(dim, -1), [-2]]).astype("int32"),
                "k": np.concatenate([np.tile(idx, dim),
                                     idx, [-2]]).astype("int32"),
                "_p": np.concatenate([acc.reshape(-1), cs, [cnt]])})

    return (rows.mapInPandas(fn, "j int, k int, _p long")
            .groupBy("j", "k").agg(F.sum("_p").alias("_p")))


def _div_tz(a: int, b: int) -> int:
    """Spark SQL's integer ``div`` (truncate toward zero) on exact
    Python ints — the same op DuckDB's ``//`` performs, pinned by
    tests/test_round4_ops.py::test_power_pc1_matches_integer_mirror."""
    return -((-a) // b) if (a < 0) != (b < 0) else abs(a) // abs(b)


def power_iteration_pc1(emb: DataFrame, dim: int = 64, n_iters: int = 3,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        q_scale: int = 10**3, c_shift: int = 10**6,
                        v_scale: int = 10**3) -> DataFrame:
    """Top principal component by ``n_iters`` power iterations in
    EXACT integer arithmetic — the eigen kernel behind PCA (M8), made
    hash-checkable the same way the Lloyd step makes KMeans checkable:
    quantize once, then every matvec, renormalization, and sign fix is
    integer math that both engines reproduce bit-for-bit. Returns
    ``(dim, component)`` — the 64 fixed-point coordinates of v_k
    (scale ``v_scale``, sign fixed so the first nonzero coordinate is
    positive).

    Construction (all exact, identical values to the r9 distributed
    form — pinned by the integer mirror in test_round4_ops): q =
    floor(x·q_scale + 0.5) int64; covariance from the integer identity
    Σ(q·n − s)(q·n − s)ᵀ = n²·Σqqᵀ − n·s·sᵀ, shifted
    C_jk = (n²·craw_jk − n·s_j·s_k) div c_shift; each iteration
    u = C·v, v' = (u·v_scale) div max|u|; div truncates toward zero in
    both Spark and DuckDB (:func:`_div_tz`). Bounds at the tested SFs
    (|x| ≤ 0.6, n ≤ 2000): C ≤ 1.2e16, u·v_scale ≤ 7.7e17 — inside
    int64; for corpus-scale n the int64 partial sums in
    :func:`pc1_moment_rows` are the binding width (switch to
    DECIMAL(38,0)/object partials there first).

    Plan shape (r10 rewrite, guide §5 driver health): ONE corpus pass
    (:func:`pc1_moment_rows`) whose dim²+dim+1-row aggregate — a fixed
    size independent of corpus rows, the m13-2m/x87 collect precedent
    — is collected to the driver, and the power iterations run on the
    driver over the 64×64 integer matrix: zero per-round Spark jobs.
    The r9 form unrolled each iteration as broadcast join + groupBy +
    crossJoin + lazy localCheckpoint over 64-row frames; qtime showed
    <1 s of stage runtime under ~1.7 s of wall — the residual was
    Catalyst plan-build and job scheduling, which no distributed
    shape removes at ANY scale because the frames are iterate-sized,
    not corpus-sized. The result returns as an Arrow local relation
    (LocalTableScan; one row per dimension)."""
    from data_ingest_spark.functions.localrel import arrow_local_df
    spark = emb.sparkSession

    def _empty() -> DataFrame:
        return arrow_local_df(spark, [], "dim int, component long",
                              ["dim", "component"])

    moments = {(r["j"], r["k"]): r["_p"]
               for r in pc1_moment_rows(emb, dim, vec_col,
                                        q_scale).collect()}
    n = moments.get((-2, -2), 0)
    if n == 0:
        # empty corpus: the r9 form's iterate nulls filtered to an
        # empty frame; same contract here
        return _empty()
    s = [moments[(-1, k)] for k in range(dim)]
    cov = [[_div_tz(n * n * moments[(j, k)] - n * s[j] * s[k], c_shift)
            for k in range(dim)] for j in range(dim)]
    v = [v_scale] * dim
    for _ in range(n_iters):
        u = [sum(cov[j][k] * v[k] for k in range(dim))
             for j in range(dim)]
        m = max(abs(x) for x in u)
        if m == 0:
            # degenerate (zero covariance) corpus: the distributed
            # form's div-by-zero nulls propagated to an empty result
            return _empty()
        v = [_div_tz(x * v_scale, m) for x in u]
    sgn = next((-1 if x < 0 else 1) for x in v if x != 0)
    return arrow_local_df(spark, [(k, v[k] * sgn) for k in range(dim)],
                          "dim int, component long", ["dim", "component"])


def ivf_seed_centroids(emb: DataFrame, k: int = 4, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       scale: int = 10**6) -> DataFrame:
    """The deterministic seed centroids shared by the Lloyd family:
    quantized vectors of the k smallest dense ids (``id < k``)."""
    return (emb.filter(F.col(id_col) < k)
            .select(F.col(id_col).alias("cid"),
                    _fixed_vec(F.col(vec_col), scale).alias("ce")))


def ivf_assign_state(emb: DataFrame, cents: DataFrame,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     scale: int = 10**6) -> DataFrame:
    """Mergeable IVF cell state for a (sub)corpus: assign every vector
    to its argmin-d2 centroid (exact fixed-point int64, ties → lowest
    cid — the lloyd_step assignment) and emit per-(cell, dim) partial
    sums ``(cid, dim, n, sum_q)``. Because n and sum_q are exact
    integers the state is associative: state(A) ⊕ state(B) =
    state(A ∪ B) bit-for-bit — the property that makes nightly index
    maintenance a batch-sized job instead of a corpus-sized one.

    Plan: centroids broadcast, assignment folds map-side, one grouped
    aggregation keyed by (cid, dim) — shuffle size = k·dims partials,
    independent of corpus size."""
    q = emb.select(F.col(id_col),
                   _fixed_vec(F.col(vec_col), scale).alias("qe"))
    d = (q.join(F.broadcast(cents))
         .withColumn("d2", _d2_fold("qe", "ce")))
    w = W.partitionBy(id_col).orderBy("d2", "cid")
    assign = (d.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") == 1)
              .select("cid", "qe"))
    return (assign.select("cid", F.posexplode("qe").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("val").cast("long").alias("sum_q"))
            .select("cid", (F.col("dim") + 1).cast("int").alias("dim"),
                    "n", "sum_q"))


def merge_ivf_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """⊕ for ivf_assign_state outputs: integer partial sums add."""
    return (a.unionByName(b)
            .groupBy("cid", "dim")
            .agg(F.sum("n").cast("long").alias("n"),
                 F.sum("sum_q").cast("long").alias("sum_q")))


def kcenter_greedy(emb: DataFrame, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   scale: int = 10**6) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985 — the classic 2-approximation): seed with the
    smallest id, then k−1 times add the point farthest from the
    selected set. The canonical diversity-coreset pick for curating a
    training subset that COVERS embedding space (max-min objective)
    instead of sampling its density peaks; the selection radius it
    emits per round is the standard coverage certificate.

    Exact and cross-engine: vectors quantize to int64 fixed point
    (scale 1e6, the x82 Lloyd convention) so every squared distance is
    an exact integer; argmax ties break on ascending id. Returns
    ``(sel_order, vec_id, radius2)`` — radius2 = the max-min squared
    quantized distance at selection time (0 for the seed), a
    monotonically non-increasing sequence.

    Plan: k−1 corpus passes, each a map-side distance fold against ≤ k
    broadcast literal centers followed by a TakeOrdered(1) — no joins,
    no window, no per-point driver data; only the k selected rows
    (64 ints each) ever reach the driver, which is the output itself.
    The recompute-per-round form (≤ k folds/point instead of a
    checkpointed running minimum) trades ≤ k× map work for having NO
    iterate state — at corpus scale each pass is scan-speed."""
    spark = emb.sparkSession
    schema = "sel_order int, vec_id long, radius2 long"
    q = (emb.select(F.col(id_col),
                    _fixed_vec(F.col(vec_col).cast("array<double>"),
                               scale).alias("_qe"))
         .persist())
    seeds = q.orderBy(F.col(id_col).asc()).limit(1).collect()
    if not seeds:
        q.unpersist()
        return spark.createDataFrame([], schema)
    seed = seeds[0]
    centers = [(0, seed[id_col], 0, list(seed["_qe"]))]
    for r in range(1, k):
        carr = F.array(*[F.array(*[F.lit(int(v)) for v in c[3]])
                         for c in centers])
        dmin = F.array_min(
            F.transform(carr, lambda c: _d2_fold(F.col("_qe"), c)))
        top = (q.select(F.col(id_col), dmin.alias("_dmin"), "_qe")
               .orderBy(F.col("_dmin").desc(), F.col(id_col).asc())
               .limit(1).collect()[0])
        if int(top["_dmin"]) == 0:
            # max-min distance 0 ⇔ every point coincides with a
            # selected center (k ≥ #distinct points): selecting more
            # would only re-emit already-covered ids with radius2=0.
            break
        centers.append((r, top[id_col], int(top["_dmin"]),
                        list(top["_qe"])))
    q.unpersist()
    return spark.createDataFrame(
        [(o, int(i), int(d)) for o, i, d, _ in centers], schema)


def standardize_dims(emb: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     scale: int = 10**6) -> DataFrame:
    """Per-dimension z-score standardization of an embedding column —
    the feature-scaling pass before distance-based anything (ANN,
    k-means, coresets): one dominant dimension otherwise owns every
    Euclidean comparison. Returns the long form ``(id, dim, z)``.

    Exactness contract: values quantize to int64 fixed point (the x82
    Lloyd convention), per-dimension count/sum/sum-of-squares
    accumulate as DECIMAL(38,0) (Σq² and the n·Σq² zero-variance
    product overflow int64 at corpus scale; decimal matches DuckDB's
    widening and stays exact — associative, partitioning-independent),
    and the z-score is one pinned-order double expression on those
    integers, so the result is reproducible across engines. Zero-
    variance dimensions (detected exactly: n·Σq² = (Σq)²) emit z = 0
    instead of dividing by zero. One explode + one bounded groupBy
    (rows = dims), stats broadcast back onto the long frame.
    """
    px = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim", "_v")).select(
        id_col, "dim",
        F.round(F.col("_v") * scale).cast("long").alias("_q"))
    dq = F.col("_q").cast("decimal(38,0)")
    st = px.groupBy("dim").agg(
        F.count("*").cast("decimal(38,0)").alias("_n"),
        F.sum(dq).cast("decimal(38,0)").alias("_s"),
        F.sum(dq * dq).cast("decimal(38,0)").alias("_ss"))
    mean = F.col("_s").cast("double") / F.col("_n").cast("double")
    var = (F.col("_ss").cast("double") / F.col("_n").cast("double")
           - mean * mean)
    z = F.when(F.col("_ss") * F.col("_n") == F.col("_s") * F.col("_s"),
               F.lit(0.0)).otherwise(
        F.round((F.col("_q").cast("double") - mean) / F.sqrt(var), 6))
    return (px.join(F.broadcast(st), "dim")
            .select(id_col, F.col("dim").cast("long").alias("dim"),
                    z.alias("z")))
