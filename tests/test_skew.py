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


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join handling is the third leg of the skew story
    (after salting and replication): with a pathologically hot key, the
    final adaptive plan must mark the sort-merge join's skewed side as
    split (skew=true) — the runtime re-plan we rely on at 100 TB when the
    skew isn't known ahead of time."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), F.lit("v").alias("v")
        )
        joined = left.join(right, "k")
        # materialize THIS DataFrame's queryExecution (count() would spawn
        # a separate execution and leave this adaptive plan non-final)
        assert len(joined.collect()) == 180_000 + 200
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
