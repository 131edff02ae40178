"""Integer fixed-point PageRank (operators/graph.py)."""

from data_ingest_spark.operators.graph import SCALE, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_hub_ranks_highest(spark):
    # a, b, c all point at hub; hub points back at a only
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub"),
                       ("hub", "a")])
    r = {row["id"]: row["rank_int"] for row in
         pagerank(e, max_iter=10).collect()}
    # hub and a (which receives the hub's whole mass) are the top two;
    # the exact leader alternates with iteration parity on this cycle
    assert sorted(r, key=r.get, reverse=True)[:2] in (["hub", "a"],
                                                      ["a", "hub"])
    assert r["a"] > r["b"]            # a gets the hub's mass too
    assert r["b"] == r["c"]           # symmetric leaves tie exactly


def test_pagerank_mass_is_conserved_up_to_floor_leak(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = pagerank(e, max_iter=20).collect()
    total = sum(r["rank_int"] for r in rows)
    assert abs(total - SCALE) / SCALE < 1e-6
    # a 3-cycle is symmetric: all ranks exactly equal
    assert len({r["rank_int"] for r in rows}) == 1


def test_pagerank_layout_independent(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(23)]
    a = {r["id"]: r["rank_int"]
         for r in pagerank(_edges(spark, pairs), max_iter=6).collect()}
    b = {r["id"]: r["rank_int"]
         for r in pagerank(_edges(spark, pairs).repartition(11),
                           max_iter=6).collect()}
    assert a == b
