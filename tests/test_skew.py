"""Salted skew operators must be RESULT-identical to their plain forms."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.skew import (
    replicated_skew_join,
    salted_count_distinct,
)


def test_salted_count_distinct_equals_plain(spark):
    # heavy skew: key 'hot' holds most rows and most distinct users
    rows = [("hot", i % 97) for i in range(500)] + [("cold", i) for i in range(7)]
    df = spark.createDataFrame(rows, "k string, u int")
    got = {
        r.k: r.n
        for r in salted_count_distinct(df, ["k"], "u", n_salts=8, out_col="n").collect()
    }
    expect = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n")).collect()
    }
    assert got == expect == {"hot": 97, "cold": 7}


def test_replicated_skew_join_equals_plain(spark):
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "lid int, k int"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (3, "z")], "k int, v string")
    got = sorted(
        (r.lid, r.k, r.v)
        for r in replicated_skew_join(left, right, on="k", n_salts=4).collect()
    )
    expect = sorted((r.lid, r.k, r.v) for r in left.join(right, "k").collect())
    assert got == expect and len(got) == 67  # keys 0,1 match; key 2 drops
