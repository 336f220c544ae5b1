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
