"""Partition-independence of the integer-unit laws: BM25 scores, PageRank
ranks, and the token-budget take must be byte-identical under any
repartitioning — the property that makes them legal to run on a cluster
whose partitioning the user doesn't control."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.graph import pagerank_int
from ingestion_scripts_spark.operators.retrieval import bm25_topk, token_budget_take

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _docs(spark, n=40):
    rows = [
        (i, " ".join(WORDS[j % len(WORDS)] for j in range(i, i + 6)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_scores_survive_repartition(spark):
    docs = _docs(spark)
    q = spark.createDataFrame(
        [(0, "alpha"), (0, "gamma"), (1, "zeta")], "query_id bigint, term string"
    )

    def run(d):
        return sorted(
            (r.query_id, r.rnk, r.doc_id, r.score_u)
            for r in bm25_topk(d, q, "doc_id", "text", topk=5).collect()
        )

    assert run(docs) == run(docs.repartition(7)) == run(docs.repartition(1))


def test_pagerank_survives_repartition(spark):
    edges = spark.createDataFrame(
        [(str(i % 5), str((i * 3) % 7), 1 + i % 4) for i in range(30)],
        "src string, dst string, w bigint",
    )

    def run(e):
        return sorted(
            (r.node, r.pr_u) for r in pagerank_int(e, "src", "dst", "w", 3).collect()
        )

    assert run(edges) == run(edges.repartition(5))


def test_token_budget_take_survives_repartition(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "w " * (1 + i % 5)) for i in range(30)],
        "doc_id bigint, source string, text string",
    )
    ntok = F.size(F.split(F.trim(F.col("text")), " "))

    def run(d):
        return sorted(
            (r.doc_id, r.cum_before)
            for r in token_budget_take(d, "source", "doc_id", ntok, {}, 6).collect()
        )

    assert run(docs) == run(docs.repartition(9))


def test_profiling_laws_survive_repartition(spark):
    """KS, CUSUM, MI, and the sparse-pair style integer snaps of the new
    profiling family are partition-order independent by construction —
    pin it."""
    from ingestion_scripts_spark.operators import profiling as PR

    rows = [
        ("g" + str(i % 3), i, float((i * 37) % 101) / 7.0) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "grp string, event_id bigint, value double")

    def ks(d):
        return sorted(
            (r.grp, r.n_a, r.n_b, r.d_num, r.ks)
            for r in PR.ks_statistic(
                d, "grp", PR.snap_units(F.col("value"), 1000000),
                F.col("event_id") % 2 == 0,
            ).collect()
        )

    def cusum(d):
        return sorted(
            (r.grp, r.n, r.k_at_max, r.s_abs_max)
            for r in PR.cusum_changepoint(
                d, "grp", ["event_id"], PR.snap_units(F.col("value"), 100)
            ).collect()
        )

    def mi(d):
        dd = d.select(
            (F.col("event_id") % 5).cast("string").alias("x"),
            (F.col("event_id") % 3).cast("string").alias("y"),
        )
        return sorted(
            (r.x, r.y, r.nxy, r.mi_nano, r.total_mi_nano)
            for r in PR.mutual_information(dd, "x", "y").collect()
        )

    for fn in (ks, cusum, mi):
        assert fn(df) == fn(df.repartition(11)) == fn(df.repartition(1)), fn.__name__
