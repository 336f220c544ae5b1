"""Invariants for the r4 batch-3 queries: the leakage-safe split must have
ZERO cross-split near-dup pairs (the property it exists for), RRF fusion
must rank any doc present in both lists above one with a single equal-rank
appearance, and the file plan must partition each source exactly."""

import __spark_entry__ as E
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_leakage_safe_split_has_no_cross_split_pairs(spark):
    rows = E.queries()["leakage_safe_split"](spark, SF).collect()
    assert rows, "split report is empty"
    assert all(r.cross_split_pairs == 0 for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # clusters partition docs: n_docs >= n_clusters per split
    assert all(r.n_docs >= r.n_clusters for r in rows)


def test_hybrid_rank_fusion_rrf_law(spark):
    df = E.queries()["hybrid_rank_fusion"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        expect = 0
        if r.lex_rank is not None:
            expect += 1_000_000_000 // (60 + r.lex_rank)
        if r.dense_rank is not None:
            expect += 1_000_000_000 // (60 + r.dense_rank)
        assert r.rrf_nano == expect
    # fused_rank is 1..10 contiguous per query
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.fused_rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_output_file_plan_partitions_each_source(spark):
    from ingestion_scripts_spark.sources.readers import load_table

    plan = E.queries()["output_file_plan"](spark, SF)
    docs = load_table(spark, SF, "documents")
    per_source = {
        r.source: (r.n, r.chars)
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
        ).collect()
    }
    got = {
        r.source: (r.n, r.chars)
        for r in plan.groupBy("source").agg(
            F.sum("n_docs").alias("n"), F.sum("chars").alias("chars")
        ).collect()
    }
    assert got == per_source
    # every file except possibly the last per source starts under target
    for r in plan.collect():
        assert r.n_docs >= 1


def test_mmr_lambda_one_degenerates_to_pure_relevance(spark):
    # with lam = 1 the redundancy term vanishes: greedy MMR must pick
    # exactly the cosine top-k_select in rank order
    from ingestion_scripts_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )
    from ingestion_scripts_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 101 == 0)
    mmr = mmr_rerank(q, emb, k_candidates=8, k_select=3,
                     lam_num=10, lam_den=10).collect()
    top = cosine_topk(q, emb, k=3).collect()
    got = {(r.query_id, r.sel_round): r.match_id for r in mmr}
    want = {(r.query_id, r.rank): r.match_id for r in top}
    assert got == want


def test_mmr_selects_distinct_candidates(spark):
    rows = __import__("__spark_entry__").queries()["mmr_diverse_topk"](
        spark, SF
    ).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.match_id)
    assert per_q
    for ids in per_q.values():
        assert len(ids) == len(set(ids)) == 3
