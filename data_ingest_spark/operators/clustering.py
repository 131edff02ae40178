"""M13: community detection on the SNN graph.

Reference: FindClusters(algorithm=1 Louvain, resolution=0.5) at
/root/reference/src/QC_helpers/configureEmbedding.r:107-115.

Two implementations:

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

from pyspark.sql import DataFrame, functions as F


def _undirect(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst", "snn_weight").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "snn_weight"))


def label_propagation(edges: DataFrame, max_iter: int = 10,
                      checkpoint_every: int = 3) -> DataFrame:
    """(id, cluster) — weighted LPA over the undirected SNN graph.
    Deterministic: ties break to the smallest label; initial label =
    own id. Each iteration is one shuffle keyed by node; the label
    frame is localCheckpoint'ed periodically so the iterative lineage
    doesn't grow unboundedly (the standard Spark iterative-graph
    pattern)."""
    # The edge list is reused every iteration: persist it once so the
    # (possibly expensive) upstream kNN/SNN plan runs exactly once
    # instead of once per iteration.
    und = _undirect(edges).localCheckpoint()
    labels = und.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id"))
    for i in range(max_iter):
        votes = (
            und.join(labels.select(F.col("id").alias("dst"),
                                   F.col("label").alias("_nl")), "dst")
            .groupBy("src", "_nl")
            .agg(F.sum("snn_weight").alias("_w"))
        )
        top = votes.groupBy("src").agg(F.max("_w").alias("_mw"))
        best = (votes.join(top, "src")
                .filter(F.col("_w") >= F.col("_mw"))
                .groupBy("src").agg(F.min("_nl").alias("_new")))
        # nodes with no neighbors keep their label
        labels = (labels.join(best.select(F.col("src").alias("id"), "_new"),
                              "id", "left")
                  .select("id", F.coalesce("_new", "label").alias("label")))
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint()
    return labels.withColumnRenamed("label", "cluster")


def louvain_driver(edges: DataFrame, resolution: float = 0.5,
                   max_sweeps: int = 10) -> DataFrame:
    """(id, cluster) — single-level Louvain phase 1 (greedy modularity
    with the resolution parameter), pure-Python on the collected edge
    list, deterministic (nodes processed in sorted order)."""
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
