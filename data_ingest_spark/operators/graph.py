"""Graph analytics over edge lists (companion to clustering.py's LPA).

``pagerank`` is power iteration expressed as joins + groupBys — the
shape that scales to billion-edge graphs: each round is one shuffle
keyed by destination node, the edge list (with out-degrees) is
persisted once, and rank lineage is cut with localCheckpoint on a
cadence, the standard Spark iterative-graph pattern.

Determinism contract: ranks are held as int64 fixed-point (SCALE =
10^12). Per-edge contributions use integer division ``rank div
outdeg`` and damping is ``(85 * sum) div 100`` — integer sums are
associative where float sums are not, so the result is a pure
function of the graph, reproducible across engines, partitionings,
and reruns, and the full iteration is oracle-checkable in DuckDB
(registry g1_pagerank unrolls the same rounds). Floor division leaks
≤ outdeg-1 scale units of mass per node per round — at SCALE=10^12
that is a 1e-9 relative bias, far below any ranking use."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000_000_000


def pagerank(edges: DataFrame, max_iter: int = 5,
             damping_num: int = 85, damping_den: int = 100,
             checkpoint_every: int = 3) -> DataFrame:
    """(id, rank_int, rank) over directed edges (src, dst).

    rank_int is the exact int64 fixed-point rank; rank = rank_int /
    SCALE as a convenience double. Nodes receive teleport mass
    ``(SCALE * (den-num)) div (den * N)`` every round; dangling nodes
    (no out-edges) simply don't contribute, matching the oracle.
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = e.join(deg, "src").localCheckpoint()

    nodes = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id")))
             .distinct().localCheckpoint())
    n = nodes.count()
    teleport = (SCALE * (damping_den - damping_num)) // (damping_den * n)

    ranks = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    for i in range(max_iter):
        contrib = (ew.join(ranks.select(F.col("id").alias("src"), "r"), "src")
                   .select("dst", F.expr("r div outdeg").alias("c")))
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(s.select(F.col("dst").alias("id"), "s"),
                            "id", "left")
                 .select("id",
                         (F.lit(teleport)
                          + F.expr(f"({damping_num} * coalesce(s, 0L)) "
                                   f"div {damping_den}"))
                         .cast("long").alias("r")))
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "id", F.col("r").alias("rank_int"),
        F.round(F.col("r") / F.lit(float(SCALE)), 9).alias("rank"))


def bfs_hops(edges: DataFrame, seeds: DataFrame,
             max_hops: int = 8) -> DataFrame:
    """Multi-source BFS over an undirected edge list: the hop distance
    from every node to its NEAREST seed — the graph primitive behind
    label spreading from curated anchors, contamination blast-radius
    checks, and "how far is this record from a trusted source" scores.

    ``max_hops`` frontier-expansion rounds of min-distance relaxation:
    each round is one join keyed on the source node plus one groupBy
    min — linear shuffles in |edges|, no driver state, lineage cut
    every 3 rounds (the pagerank cadence). Distances are exact small
    integers, so every intermediate round is oracle-checkable; nodes
    farther than ``max_hops`` (or disconnected) report NULL.

    Returns ``(id, hops)`` over all nodes of the edge list.
    """
    und = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
           .distinct().localCheckpoint())
    nodes = und.select(F.col("src").alias("id")).distinct()
    dist = (nodes.join(seeds.select(F.col("id"), F.lit(0).alias("_d")),
                       "id", "left")
            .select("id", F.col("_d").cast("int").alias("d")))
    for i in range(max_hops):
        nbr = (und.join(dist.select(F.col("id").alias("src"),
                                    F.col("d").alias("_sd")), "src")
               .filter(F.col("_sd").isNotNull())
               .select(F.col("dst").alias("id"),
                       (F.col("_sd") + 1).alias("d")))
        dist = (dist.unionByName(nbr)
                .groupBy("id").agg(F.min("d").alias("d")))
        if (i + 1) % 3 == 0:
            dist = dist.localCheckpoint()
    return dist.select("id", F.col("d").cast("long").alias("hops"))
