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


def test_label_spread_semantics_via_entry_query(spark):
    """The unrolled 2-round label spread: seeds clamp, neighbors take the
    weighted majority, ties go to the smallest label. Checked on a
    hand graph through the same join/argmax shape as the entry query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # weighted graph: node 1..3 seeds are 97*k ids to mimic the query
    e = spark.createDataFrame(
        [(0, 10, 5), (97, 10, 3), (0, 97, 1), (194, 20, 1), (0, 20, 1)],
        ["a", "b", "w"],
    )
    esym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
    seeds = (
        esym.select(F.col("a").alias("node")).distinct()
        .where(F.col("node") % 97 == 0)
        .select("node", F.col("node").alias("label"))
    )
    votes = (
        esym.join(seeds, esym["b"] == seeds["node"])
        .groupBy(F.col("a").alias("node"), "label")
        .agg(F.sum("w").alias("votes"))
    )
    w_rank = Window.partitionBy("node").orderBy(F.desc("votes"), F.asc("label"))
    winner = (
        votes.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1).select("node", "label")
    )
    labels = winner.join(seeds.select("node"), "node", "left_anti").unionByName(seeds)
    got = {r.node: r.label for r in labels.collect()}
    # node 10: 0 votes 5 beats 97 votes 3 -> label 0
    assert got[10] == 0
    # node 20: tie between 194 (w=1) and 0 (w=1) -> smallest label 0
    assert got[20] == 0
    # seeds clamped to themselves even though they neighbor other seeds
    assert got[0] == 0 and got[97] == 97 and got[194] == 194
