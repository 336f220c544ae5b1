"""Bucketed co-located join must plan WITHOUT any Exchange (no shuffle)."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is static; a LOCATION-scoped database keeps table files
    # in the test tmp dir instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'")
    spark.sql("USE bktdb")
    try:
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") + 7).alias("b")
        )
        write_bucketed(left, "bkt_left", "k", 4)
        write_bucketed(right, "bkt_right", "k", 4)
        # disable broadcast so the only shuffle-free plan is the bucket join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bkt_left", "bkt_right", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        got = joined.filter(F.col("k") == 42).collect()[0]
        assert (got.a, got.b) == (84, 49)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
        spark.sql("USE default")
        spark.sql("DROP DATABASE IF EXISTS bktdb")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from ingestion_scripts_spark.operators.bucketing import write_partitioned

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("part")
    )
    path = str(tmp_path / "parted")
    write_partitioned(df, path, ["part"])
    got = spark.read.parquet(path).filter(F.col("part") == "2")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert got.count() == 250
    # the partition filter must reach the scan's PartitionFilters, and the
    # scan must actually skip non-matching directories
    assert "PartitionFilters" in plan and "part" in plan.split("PartitionFilters")[1][:80]
    n_files = got.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    assert n_files < all_files


def test_load_table_column_pruning(spark):
    """load_table(columns=...) must shrink the scan's ReadSchema to exactly
    the requested columns (S2 projection pushdown)."""
    from ingestion_scripts_spark.sources.readers import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "lineitem",
                    columns=["l_orderkey", "l_quantity"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan
