"""Retrieval-operator laws: BM25 ranking on a hand-computable corpus,
positional phrase intersection (incl. overlapping occurrences), and the
token-budget boundary rule (crossing doc kept, next dropped)."""

import math

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.retrieval import (
    bm25_topk,
    phrase_hits,
    token_budget_take,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_tf_orders_within_equal_length(spark):
    # same dl, same matched term: higher tf must rank first
    docs = _docs(
        spark,
        [(1, "a x y z"), (2, "a a a z"), (3, "b b b b")],
    )
    q = spark.createDataFrame([(0, "a")], "query_id bigint, term string")
    got = bm25_topk(docs, q, "doc_id", "text", topk=5).orderBy("rnk").collect()
    assert [r.doc_id for r in got] == [2, 1]  # doc 3 never matches
    assert got[0].score > got[1].score > 0


def test_bm25_score_matches_closed_form(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a a c d"), (3, "e f")])
    q = spark.createDataFrame([(0, "a")], "query_id bigint, term string")
    got = {r.doc_id: r.score_u for r in bm25_topk(docs, q, "doc_id", "text").collect()}
    n, avgdl, df = 3, 8 / 3, 2
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        tfp = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return math.floor(idf * tfp * 1e6 + 0.5)

    assert got == {1: s(1, 2), 2: s(2, 4)}


def test_bm25_rank_tiebreak_is_doc_id(spark):
    docs = _docs(spark, [(7, "a b"), (3, "a c"), (9, "d d")])
    q = spark.createDataFrame([(0, "a")], "query_id bigint, term string")
    got = bm25_topk(docs, q, "doc_id", "text").orderBy("rnk").collect()
    assert [r.doc_id for r in got] == [3, 7]  # equal scores → id asc


def test_phrase_hits_counts_overlapping_starts(spark):
    docs = _docs(spark, [(1, "x x x x"), (2, "x y x x"), (3, "y y")])
    phrases = spark.createDataFrame(
        [("x x", ["x", "x"])], "phrase string, terms array<string>"
    )
    got = {
        r.doc_id: r.n_hits
        for r in phrase_hits(docs, phrases, "doc_id", "text").collect()
    }
    assert got == {1: 3, 2: 1}  # overlapping starts all count; doc 3 absent


def test_phrase_hits_requires_full_alignment(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a c b"), (3, "a b")])
    phrases = spark.createDataFrame(
        [("a b c", ["a", "b", "c"])], "phrase string, terms array<string>"
    )
    got = phrase_hits(docs, phrases, "doc_id", "text").collect()
    assert [(r.doc_id, r.n_hits) for r in got] == [(1, 1)]


def test_token_budget_boundary_doc_kept(spark):
    # one source, hash order is deterministic; budget 5 tokens
    docs = spark.createDataFrame(
        [(i, "s", "t " * 4) for i in range(4)],
        "doc_id bigint, source string, text string",
    )
    out = token_budget_take(
        docs, "source", "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")),
        {}, 5,
    ).orderBy("cum_before").collect()
    # each doc is 4 tokens: cum_before 0 (<5 keep), 4 (<5 keep: crossing
    # doc), 8 (stop) — exactly 2 survivors regardless of hash order
    assert [r.cum_before for r in out] == [0, 4]
    assert all(r.ntok == 4 for r in out)


def test_token_budget_is_per_source(spark):
    docs = spark.createDataFrame(
        [(1, "a", "t t t"), (2, "b", "t t t"), (3, "b", "t t t")],
        "doc_id bigint, source string, text string",
    )
    out = token_budget_take(
        docs, "source", "doc_id",
        F.size(F.split(F.col("text"), " ")),
        {"a": 1}, 100,
    )
    by_src = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert by_src == {"a": 1, "b": 2}  # a's budget crossed by doc 1; b keeps all
