"""Similarity search: brute-force correctness, LSH-ANN recall sanity."""

import math

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import similarity as S


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_cosine_topk_exact(spark):
    emb = _vecs(spark)
    out = S.cosine_topk(emb.filter(F.col("vec_id") == 0), emb, k=2).collect()
    assert [(r.match_id, r.rank) for r in out] == [(1, 1), (4, 2)]
    expect = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(out[0].sim - round(expect, 6)) < 1e-6


def test_lsh_ann_subset_of_exact_ranking(spark):
    emb = _vecs(spark)
    exact = {
        (r.query_id, r.match_id)
        for r in S.cosine_topk(emb, emb, k=4).collect()
    }
    ann = S.lsh_ann_topk(emb, emb, dim=4, num_planes=2, k=4).collect()
    # every ANN result must be a true pair with correctly computed sim
    assert {(r.query_id, r.match_id) for r in ann} <= exact


def test_hyperplanes_deterministic():
    assert S.hyperplanes(2, 4) == S.hyperplanes(2, 4)
    assert all(-1.0 <= v <= 1.0 for row in S.hyperplanes(3, 8) for v in row)


def test_pandas_cosine_pairs_match_fold_operator(spark):
    """The numpy applyInPandas kernel must produce the same pairs (and
    round-6 sims) as the expression-fold operator on real testdata."""
    from ingestion_scripts_spark.operators.similarity import (
        blocked_cosine_pairs,
        blocked_cosine_pairs_pandas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in blocked_cosine_pairs(emb, "label", threshold=0.3).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.cos
        for r in blocked_cosine_pairs_pandas(emb, "label", threshold=0.3).collect()
    }
    assert set(exact) == set(fast)
    for k in exact:
        assert abs(exact[k] - fast[k]) < 1e-9, (k, exact[k], fast[k])
