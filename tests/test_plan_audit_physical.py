"""Red/green paths for the physical-plan scale audit (VERDICT r9 item 4)
and the Generate boundedness fix (ADVICE r9).

The registry-wide sweep in test_plan_hygiene.py proves HEAD is clean;
these prove the gate actually FIRES on each scale-killer shape — a gate
whose red path is untested is decoration."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.plan_audit import (
    physical_scale_audit,
    single_partition_stages,
    unbounded_global_sorts,
    unbounded_global_windows,
)

SF = "/root/testdata/sf0.001"


def _li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


# ------------------------------------------------------------- red paths

def test_fires_on_global_sort_without_limit(spark):
    hard, sorts = physical_scale_audit(_li(spark).orderBy("l_orderkey"))
    assert not hard
    assert len(sorts) == 1 and "global sort" in sorts[0]


def test_fires_on_coalesce_1(spark):
    hard = single_partition_stages(_li(spark).coalesce(1))
    assert len(hard) == 1 and "coalesce(1)" in hard[0]


def test_fires_on_repartition_1(spark):
    hard = single_partition_stages(_li(spark).repartition(1))
    assert len(hard) == 1 and "SinglePartition" in hard[0]


def test_fires_on_unpartitioned_window(spark):
    df = _li(spark).withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    hard = single_partition_stages(df)
    assert len(hard) == 1 and "WindowExec" in hard[0]


def test_generate_false_negative_closed(spark):
    # ADVICE r9: collect_list over the corpus -> explode -> unpartitioned
    # window re-inflates a post-aggregate input to corpus size; the
    # logical gate must fire (it previously classified Generate as
    # inheriting its child's boundedness and missed this)
    df = (
        _li(spark)
        .groupBy("l_returnflag")
        .agg(F.collect_list("l_orderkey").alias("xs"))
        .select(F.explode("xs").alias("x"))
        .withColumn("rn", F.row_number().over(Window.orderBy("x")))
    )
    assert unbounded_global_windows(df), "logical gate must flag this"
    assert single_partition_stages(df), "physical gate must flag this"


# ----------------------------------------------------------- green paths

def test_green_postagg_order_and_limit(spark):
    agg = (
        _li(spark)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    assert physical_scale_audit(agg.orderBy("l_returnflag")) == ([], [])
    assert physical_scale_audit(_li(spark).orderBy("l_orderkey").limit(5)) == ([], [])
    # coalesce(1) of a post-aggregate frame is the legitimate small-output
    # write shape
    assert physical_scale_audit(agg.coalesce(1)) == ([], [])
    # constant-key aggregate: partial agg bounds the exchange input
    assert physical_scale_audit(
        _li(spark).groupBy(F.lit(1)).agg(F.sum("l_quantity").alias("s"))
    ) == ([], [])


def test_green_foldable_generate_window(spark):
    # explode of a LITERAL array over a post-agg frame multiplies rows by
    # a plan-time constant — bounded, window downstream is legal
    df = (
        _li(spark)
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
        .select("s", F.explode(F.array(F.lit(1), F.lit(2))).alias("q"))
        .withColumn("rn", F.row_number().over(Window.orderBy("s", "q")))
    )
    assert unbounded_global_windows(df) == []
    assert single_partition_stages(df) == []


def test_green_keyed_window_over_corpus(spark):
    df = _li(spark).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        ),
    )
    assert physical_scale_audit(df) == ([], [])


def test_audit_sees_through_cache(spark):
    # violations inside a cached subtree must still be reported: the
    # boundedness (and the red flag) comes from the plan that FILLS the
    # cache
    bad = _li(spark).repartition(1)
    bad.persist()
    try:
        probe = bad.select("l_orderkey")
        assert single_partition_stages(probe), "must see through InMemoryRelation"
    finally:
        bad.unpersist()
