"""PageRank integer-law tests: closed-form one-round check, no-in-link
baseline, and mass ordering on a chain."""

from ingestion_scripts_spark.operators.graph import pagerank_int


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w bigint")


def test_pagerank_one_round_closed_form(spark):
    e = _edges(spark, [("a", "b", 1), ("a", "c", 1), ("b", "c", 2)])
    got = {r.node: r.pr_u for r in pagerank_int(e, "src", "dst", "w", iters=1).collect()}
    # r0 = 1e6; contribs: b ← (1e6·1)//2; c ← (1e6·1)//2 + (1e6·2)//2
    assert got == {
        "a": 150_000,
        "b": 150_000 + (85 * 500_000) // 100,
        "c": 150_000 + (85 * 1_500_000) // 100,
    }


def test_pagerank_no_in_links_floor(spark):
    e = _edges(spark, [("x", "y", 3)])
    got = {r.node: r.pr_u for r in pagerank_int(e, "src", "dst", "w", iters=3).collect()}
    assert got["x"] == 150_000  # nothing points at x after round 1
    assert got["y"] > got["x"]


def test_pagerank_chain_orders_downstream_higher(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1)])
    got = {r.node: r.pr_u for r in pagerank_int(e, "src", "dst", "w", iters=3).collect()}
    assert got["c"] > got["b"] > got["a"]


def test_bfs_hops_matches_bruteforce(spark):
    """bfs_hops on a known graph: two components, one seeded; hop counts
    match a hand BFS and the unseeded component is absent."""
    from ingestion_scripts_spark.operators import graph as G
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (10, 11)],
        ["a", "b"],
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hops"] for r in G.bfs_hops(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 5: 2, 3: 3, 6: 3, 4: 4}
    # max_hops truncates: at 2 hops nodes 3/6/4 are absent
    got2 = {
        r["node"]: r["hops"]
        for r in G.bfs_hops(edges, seeds, max_hops=2).collect()
    }
    assert got2 == {0: 0, 1: 1, 2: 2, 5: 2}
    # a seed inside both components covers both
    seeds2 = spark.createDataFrame([(0,), (10,)], ["node"])
    got3 = {r["node"]: r["hops"] for r in G.bfs_hops(edges, seeds2).collect()}
    assert got3[10] == 0 and got3[11] == 1 and got3[0] == 0
