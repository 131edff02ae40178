"""M13: community detection on the SNN graph.

Reference: FindClusters(algorithm=1 Louvain, resolution=0.5) at
/root/reference/src/QC_helpers/configureEmbedding.r:107-115.

Three implementations:

  louvain_distributed — distributed Louvain phase 1: parallel greedy
      modularity moves (Jacobi-style 2-coloring for determinism), all
      joins + groupBys — the Louvain semantics at billion-edge scale.

  label_propagation — fully distributed: each round every node adopts
      the label with the highest total edge weight among its
      neighbors (min-label tie-break ⇒ deterministic). Rounds are
      joins + groupBys over the edge list — the shape that survives a
      billion-edge graph. This is the engine's default.

  louvain_driver    — faithful Louvain modularity optimization (phase
      1, single level) in pure Python on the collected edge list, for
      parity checks at reference scale (≤ ~10⁵ nodes). The collect is
      of the PRUNED SNN edge list, the same object Seurat holds
      in-memory.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, Window as W, functions as F


#: Fixed-point scale for LPA/Louvain vote weights: LCM(10..19), so
#: every SNN Jaccard c/(2k−c) with k=10 scales to an EXACT int64 —
#: integer vote sums are order-insensitive where float sums are not
#: (the determinism contract shared with the registry's unrolled SQL
#: oracles). For other k the scaled weight is rounded to the nearest
#: integer: still engine-identical (one shared double round), sums
#: still exact.
LPA_SCALE = 232792560


def scale_weights_fixed(edges: DataFrame, scale: int = LPA_SCALE,
                        weight_col: str = "snn_weight") -> DataFrame:
    """Replace a float edge weight with its fixed-point integer (held
    in double — exact below 2^53) so iterative vote aggregations are
    summation-order-independent."""
    return edges.withColumn(
        weight_col, F.round(F.col(weight_col) * scale).cast("double"))


def _undirect(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst", "snn_weight").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "snn_weight"))


def pin_partitioning(df: DataFrame, key: str) -> DataFrame:
    """Materialize ``df`` once and return a PERSISTED copy hash-
    partitioned by ``key`` whose partitioning every downstream join /
    aggregation on that key can reuse — the barrier for iterative
    operators that join the same frame every round.

    Why this exact construction (all three steps measured on 4.1.2):

    - ``localCheckpoint`` first: truncates the upstream lineage so the
      per-round plans stay shallow — but under AQE a checkpointed
      LogicalRDD reports UnknownPartitioning, so a checkpoint alone
      CANNOT carry the partitioning (the round-8 louvain assumption
      that it could was wrong; every round silently re-exchanged the
      edge list).
    - ``repartition(n, key)`` with ``n`` = the checkpoint's OWN
      partition count: the count AQE already coalesced to is the
      data-sized choice — a fixed ``spark.sql.shuffle.partitions``
      pinned 32 near-empty tasks per round onto a 2-partition graph
      (9.3 s vs 4.0 s at sf0.1) while still being one number on a
      billion-edge cluster input.
    - ``persist``: a CACHED plan's output partitioning IS preserved
      (``canChangeCachedPlanOutputPartitioning=false`` default), so
      consumers skip the exchange; this is the partitioning carrier.

    Storage contract: this holds TWO copies of the frame for the
    session (the checkpoint blocks — which must not be dropped, their
    lineage is truncated — and the persisted repartition, which
    recomputes FROM the checkpoint if evicted). Both are
    MEMORY_AND_DISK, so the worst case is 2× the frame on disk, an
    accepted cost for O(rounds) edge-sized exchanges saved; a caller
    that is done with the returned frame can ``unpersist()`` it to
    release the cached copy early (the bench harness evicts both
    between queries).
    """
    ck = df.localCheckpoint()
    n = max(ck.rdd.getNumPartitions(), 1)
    return ck.repartition(n, F.col(key)).persist()


def label_propagation(edges: DataFrame, max_iter: int = 10,
                      checkpoint_every: int = 1) -> DataFrame:
    """(id, cluster) — weighted LPA over the undirected SNN graph.
    Deterministic: ties break to the smallest label; initial label =
    own id. Each iteration is one shuffle keyed by node; the label
    frame is localCheckpoint'ed periodically so the iterative lineage
    doesn't grow unboundedly (the standard Spark iterative-graph
    pattern).

    Per-round plan shape (round-8 verdict ask #2): the undirected edge
    list goes through :func:`pin_partitioning` on ``dst`` — checkpoint
    (lineage cut) → data-sized repartition → persist (the partitioning
    carrier; see the helper for why a checkpoint alone loses it under
    AQE) — so the per-round neighbor join only exchanges the
    (node-sized) label frame, never the edge list. Label checkpoints
    are LAZY (truncation rides the next round's job, no blocking
    driver job) and default to EVERY round: labels(i) references
    labels(i-1) twice (the vote join and the keep-own-label
    left-join), so a cadence-k checkpoint lets the plan tree grow 2^k
    between barriers — cadence 1 measured 1.8 s vs cadence 3's
    2.4-2.7 s at sf0.1, bit-identical output."""
    und = pin_partitioning(_undirect(edges), "dst")
    labels = und.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id"))
    w_top = W.partitionBy("src").orderBy(F.desc("_w"), F.asc("_nl"))
    for i in range(max_iter):
        votes = (
            und.join(labels.select(F.col("id").alias("dst"),
                                   F.col("label").alias("_nl")), "dst")
            .groupBy("src", "_nl")
            .agg(F.sum("snn_weight").alias("_w"))
        )
        # argmax weight with min-label tie-break as ONE window over the
        # vote shuffle's own (src) partitioning — replaces the
        # historical groupBy(max) + join + groupBy(min) round-trip
        # (2 exchanges saved per iteration, identical semantics).
        best = (votes.withColumn("_rk", F.row_number().over(w_top))
                .filter(F.col("_rk") == 1)
                .select(F.col("src").alias("id"), F.col("_nl").alias("_new")))
        # nodes with no neighbors keep their label
        labels = (labels.join(best, "id", "left")
                  .select("id", F.coalesce("_new", "label").alias("label")))
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels.withColumnRenamed("label", "cluster")


def louvain_driver(edges: DataFrame, resolution: float = 0.5,
                   max_sweeps: int = 10,
                   max_driver_rows: int | None = None) -> DataFrame:
    """(id, cluster) — single-level Louvain phase 1 (greedy modularity
    with the resolution parameter), pure-Python on the collected edge
    list, deterministic (nodes processed in sorted order).
    Ceiling-guarded (operators.guards): an edge list above
    ``max_driver_rows`` raises instead of collecting — use
    :func:`louvain_distributed` or :func:`label_propagation`."""
    from data_ingest_spark.operators.guards import assert_driver_ceiling
    assert_driver_ceiling(
        edges, "driver-side Louvain (louvain_driver)",
        "louvain_distributed or label_propagation", max_driver_rows)
    rows = edges.select("src", "dst", "snn_weight").collect()
    w = defaultdict(dict)
    for r in rows:
        w[r["src"]][r["dst"]] = w[r["src"]].get(r["dst"], 0.0) + r["snn_weight"]
        w[r["dst"]][r["src"]] = w[r["dst"]].get(r["src"], 0.0) + r["snn_weight"]
    nodes = sorted(w)
    m2 = sum(sum(nb.values()) for nb in w.values())  # = 2m
    if m2 == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([(n, n) for n in nodes],
                                     "id string, cluster string")
    deg = {n: sum(w[n].values()) for n in nodes}
    comm = {n: n for n in nodes}
    comm_deg = dict(deg)

    for _ in range(max_sweeps):
        moved = False
        for n in nodes:
            cn = comm[n]
            comm_deg[cn] -= deg[n]
            # weight from n to each neighboring community
            to_comm = defaultdict(float)
            for nb, wt in w[n].items():
                to_comm[comm[nb]] += wt
            best_c, best_gain = cn, 0.0
            for c, wc in sorted(to_comm.items()):
                gain = wc - resolution * deg[n] * comm_deg[c] / m2
                if gain > best_gain + 1e-12:
                    best_c, best_gain = c, gain
            comm[n] = best_c
            comm_deg[best_c] = comm_deg.get(best_c, 0.0) + deg[n]
            moved = moved or best_c != cn
        if not moved:
            break

    # canonical cluster ids: min member id
    rep = defaultdict(list)
    for n, c in comm.items():
        rep[c].append(n)
    label = {}
    for c, members in rep.items():
        r = min(members)
        for n in members:
            label[n] = r
    spark = edges.sparkSession
    return spark.createDataFrame(sorted(label.items()),
                                 "id string, cluster string")


def louvain_distributed(edges: DataFrame, resolution: float = 0.5,
                        max_iter: int = 8) -> DataFrame:
    """(id, cluster) — distributed Louvain phase 1: parallel greedy
    modularity moves over the edge list, the standard vertex-parallel
    scheme (each round every *eligible* node evaluates the gain of
    moving to each neighboring community against the current community
    degrees and takes the best positive move).

    Determinism & oscillation control: nodes are 2-colored by a stable
    hash of their id and only one color class may move per round
    (classic Jacobi-style alternation — two adjacent nodes can never
    swap communities in the same round, which is the known oscillation
    mode of naive parallel Louvain). Ties break to the smallest
    community id. Every step is joins + groupBys keyed by node or
    community — linear shuffles, no collect, survives a billion-edge
    graph; lineage is cut with localCheckpoint like label_propagation.

    Scale contract vs ``louvain_driver`` (the sequential parity
    implementation): same gain formula ΔQ ∝ w(n→C) − γ·deg(n)·ΣC/2m,
    evaluated Jacobi-parallel instead of Gauss-Seidel-sequential, so
    cluster boundaries can differ on ambiguous graphs; on
    well-separated communities both converge to the same partition
    (pinned by tests/test_clustering.py)."""
    # Pin hash(dst) across all 8 rounds (see pin_partitioning for why
    # persist, not the r8 checkpoint, is the partitioning carrier): the
    # per-round joins then only exchange the (node-sized) labels frame
    # — never the (edge-sized) und. At |E| >> |V| scale this removes
    # the dominant per-round shuffle.
    und = pin_partitioning(_undirect(edges), "dst")
    # 2m is a SCALAR: collect it once at build (one tiny aggregate over
    # the pinned edge cache — Σ und weights ≡ Σ node degrees, and the
    # weights are integer-valued float64 so the sum is order-exact)
    # instead of broadcast-joining a 1-row frame into every round's
    # candidate frame (the r8 form paid one AQE broadcast stage × 8
    # rounds for it). deg itself is NOT checkpointed separately any
    # more: its only remaining consumer is the round-0 labels frame,
    # whose own checkpoint at the end of round 1 truncates the lineage
    # — the separate eager checkpoint was one more blocking driver job.
    m2_val = float(und.agg(F.sum("snn_weight")).collect()[0][0] or 0.0)
    deg = und.groupBy(F.col("src").alias("id")).agg(
        F.sum("snn_weight").alias("deg"))
    # 2-coloring hash: first 8 md5 hex chars as an int (not crc32 —
    # md5 is the one stable hash every SQL engine shares, so an oracle
    # can replay the identical color classes). The color is a PURE
    # FUNCTION of the id, so eligibility is a filter on the edge list's
    # src column — no label-frame column, no join, and the whole
    # neighbor-join pipeline below runs on half the edges per round.
    src_color = (F.conv(F.substring(F.md5(F.col("src").cast("string")),
                                    1, 8), 16, 10).cast("long") % 2)
    labels = deg.select("id", F.col("id").alias("comm"), "deg")

    for i in range(max_iter):
        # Community degree as a map-side-combined groupBy(comm) joined
        # back (r9 rewrite of the r8 window form): the window exchanged
        # every |V|-row label across the cluster per round, the groupBy
        # partial-aggregates to |C| rows before its exchange and the
        # join back is unhinted — AQE broadcasts the (shrinking)
        # community-degree table locally and falls back to a shuffled
        # join when |C| is cluster-scale. Sums are exact float64-held
        # integers (pre-scaled weights) either way, so the value cannot
        # depend on aggregation order or join strategy.
        cdeg = labels.groupBy("comm").agg(F.sum("deg").alias("_cdeg"))
        # ONE shared projection for both consumers below: the neighbor
        # join takes it by condition (dst == id) instead of a renamed
        # copy, so both joins' build subtrees are canonically identical
        # and AQE's stage cache materializes ONE broadcast per round
        # instead of two.
        labels_c = labels.join(cdeg, "comm").select("id", "comm", "deg",
                                                    "_cdeg")
        # Neighbor-community weights per ELIGIBLE node. ONE exchange
        # serves both the vote aggregate and the best-move window
        # below: repartition("src") clusters the joined votes by node,
        # the groupBy(src, _nc) then needs no further exchange
        # (hash(src) already clusters (src, _nc)) and the rank window
        # partitioned by the same key rides it too. The r8 form paid
        # two exchanges here (hash(src,_nc) for the combine, hash(id)
        # for the window); the single raw-vote exchange carries the
        # joined edge rows once instead of the combined votes twice —
        # at k≈10 neighbors with few distinct labels the byte totals
        # are comparable and the round loses a full stage barrier.
        nb = (und.filter(src_color == (i % 2))
              .join(labels_c, F.col("dst") == labels_c["id"])
              .select(F.col("src"), F.col("snn_weight"),
                      F.col("comm").alias("_nc"),
                      F.col("_cdeg").alias("_ncdeg"))
              .repartition("src")
              .groupBy(F.col("src").alias("id"), F.col("_nc"))
              .agg(F.sum("snn_weight").alias("_w"),
                   F.first("_ncdeg").alias("_ncdeg")))
        cand = (
            # consume the SAME labels_c subtree as the neighbor join
            # (no narrowing Project) so the broadcast is built once;
            # the extra _cdeg column is dropped by the final select.
            nb.join(labels_c, "id")
              .withColumn(
                  "_cdeg_adj",
                  F.when(F.col("_nc") == F.col("comm"),
                         F.col("_ncdeg") - F.col("deg"))
                   .otherwise(F.col("_ncdeg")))
              # Op order ((γ·deg)·cdeg)/m2 is part of the oracle
              # contract: with integer-valued (pre-scaled) weights
              # every input is float64-exact, so the two roundings
              # (product, division) are the same IEEE ops in any
              # engine and gains compare bit-identically.
              .withColumn(
                  "_gain",
                  F.col("_w") - F.lit(resolution) * F.col("deg")
                  * F.col("_cdeg_adj") / F.lit(m2_val))
        )
        # best positive move per eligible node, tie-break to the
        # smallest community id; the window reuses the hash(src=id)
        # partitioning established by the repartition above — no
        # extra exchange.
        w_best = W.partitionBy("id").orderBy(F.desc("_gain"), F.asc("_nc"))
        best = (
            cand.filter(F.col("_gain") > 1e-12)
            .withColumn("_rk", F.row_number().over(w_best))
            .filter(F.col("_rk") == 1)
            .select("id", F.col("_nc").alias("_new"))
        )
        labels = (labels.join(best, "id", "left")
                  .select("id", F.coalesce("_new", "comm").alias("comm"),
                          "deg"))
        # ONE plan (and one lazy checkpoint) per round, cadence 1: the
        # r8 form checkpointed labels_c separately every round AND
        # labels every 2 rounds — two AdaptiveSparkPlan executions per
        # round, each materializing its own stage set. With labels
        # checkpointed each round the per-round plan references the
        # prior checkpoint a bounded 3× (direct + twice via labels_c)
        # and the shared cdeg exchange is AQE-stage-cache reused, so
        # the tree stays flat without the second barrier (measured:
        # 115 → ~60 AQE stage jobs per execution at sf0.1,
        # bit-identical output).
        labels = labels.localCheckpoint(eager=False)

    # canonical cluster id = min member id
    rep = labels.groupBy("comm").agg(F.min("id").alias("cluster"))
    return labels.join(rep, "comm").select("id", "cluster")
