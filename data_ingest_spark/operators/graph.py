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

from data_ingest_spark.operators.clustering import pin_partitioning

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
    # Pin hash(src) for all rounds (clustering.pin_partitioning: a
    # persisted repartition is the only partitioning carrier under AQE)
    # — every per-round contribution join then reuses the partitioning
    # and only exchanges the (node-sized) rank frame, never the edges.
    ew = pin_partitioning(e.join(deg, "src"), "src")

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
            # lazy: truncation rides the next round's job instead of a
            # blocking per-cadence driver job
            ranks = ranks.localCheckpoint(eager=False)
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
    lazily EVERY round (dist(i) references dist(i-1) twice, so any
    longer cadence grows the plan tree 2^k between barriers).
    Distances are exact small integers, so every intermediate round is
    oracle-checkable; nodes farther than ``max_hops`` (or
    disconnected) report NULL.

    Returns ``(id, hops)`` over all nodes of the edge list.
    """
    # pin_partitioning pins hash(src) across all frontier rounds — the
    # per-round relaxation join then only exchanges the (node-sized)
    # distance frame, never the edge list.
    und = pin_partitioning(
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
        .distinct(), "src")
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
        # every round, lazily: dist(i) references dist(i-1) twice
        # (union + relaxation join), so a cadence-k checkpoint lets
        # the plan tree grow 2^k between barriers (the LPA finding)
        dist = dist.localCheckpoint(eager=False)
    return dist.select("id", F.col("d").cast("long").alias("hops"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient census over an undirected graph:
    cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, reported as a
    10-bucket histogram (bucket = min(floor(cc·10), 9)) with the
    exact-fixed-point mean cc per bucket — the graph-cohesion
    companion to the g2 triangle count (how clumped is the kNN /
    co-occurrence graph, not just how many triangles).

    Input is any (src, dst) edge list; it is canonicalized to
    distinct a<b edges first. Triangle enumeration is the standard
    two-join canonical-order form (each join keys on a vertex —
    shuffles by node, never all-pairs); per-node triangle counts come
    from exploding each triangle's three corners. Per-node cc rounds
    HALF_UP to 6dp as a 1e-6 int so the bucket mean sums int64 —
    engine-identical. Output ≤ 10 rows."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct().localCheckpoint(eager=False))
    deg = (und.select(F.col("a").alias("v"))
           .unionByName(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg")))
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tri_v = (tri.select(F.explode(F.array("x", "y", "z")).alias("v"))
             .groupBy("v").agg(F.count("*").alias("tri")))
    per_node = (deg.filter(F.col("deg") >= 2)
                .join(tri_v, "v", "left")
                .select("v", "deg",
                        F.coalesce("tri", F.lit(0)).alias("tri")))
    cc6 = F.floor(F.lit(2e6) * F.col("tri")
                  / (F.col("deg") * (F.col("deg") - 1))
                  + F.lit(0.5)).cast("long")
    bucketed = per_node.select(
        F.least(F.floor(cc6 / 100000.0), F.lit(9)).cast("int")
        .alias("bucket"), cc6.alias("_cc6"))
    return (bucketed.groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_nodes"),
                 F.round(F.sum("_cc6") / 1e6 / F.count("*"), 6)
                 .alias("mean_cc")))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of an undirected
    graph: the Pearson correlation of endpoint degrees over the
    symmetric directed edge list — positive means hubs link to hubs
    (social-network shape), negative means hubs link to leaves
    (hub-and-spoke / kNN shapes). One row: (n_edges_undirected, r).

    Degrees and all five moments are exact int64 (each undirected
    edge contributes both (da, db) and (db, da), so Σx = Σy by
    construction and the sums stay integers); r is a division chain
    over them, engine-identical at 6dp. Plan: canonical-edge distinct,
    degree aggregate, two unhinted joins of the degree table (AQE
    broadcasts when small), one 1-row moment aggregate."""
    und = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b"))
           .filter(F.col("a") != F.col("b"))
           .distinct().localCheckpoint(eager=False))
    deg = (und.select(F.col("a").alias("v"))
           .unionByName(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("deg"))
           .localCheckpoint(eager=False))
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("_db"))
    # Degree-table joins are unhinted: |deg| = |V| (cell count on the
    # kNN graph), so a forced broadcast has unbounded scale risk. AQE
    # broadcasts when the runtime size is actually small.
    ed = und.join(da, "a").join(db, "b")
    sym = (ed.select(F.col("_da").alias("x"), F.col("_db").alias("y"))
           .unionByName(ed.select(F.col("_db").alias("x"),
                                  F.col("_da").alias("y"))))
    m = sym.agg(F.count("*").alias("m"), F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"))
    num = F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / F.col("m")
    den = F.sqrt((F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
                  / F.col("m"))
                 * (F.col("syy") - F.col("sy").cast("double") * F.col("sy")
                    / F.col("m")))
    # zero degree variance (regular graphs) leaves r undefined: NULL,
    # never a divide-by-zero (ANSI mode throws on it)
    return m.select((F.col("m") / 2).cast("long").alias("n_edges"),
                    F.when(den > 0, F.round(num / den, 6))
                    .alias("assortativity"))
