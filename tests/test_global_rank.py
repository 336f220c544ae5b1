"""Law tests for operators/ranking.py::global_rank and the distributed
decile_lift (VERDICT r7/r8 item 1), plus the red-path unit for
plan_audit.unbounded_global_windows.

The oracle twin cannot catch a wrong rank that is wrong the same way on
both engines, so the primary law here is INDEPENDENT: bit-equality
against Spark's own single-partition row_number on adversarial tie data
(the semantics being replaced), and a pure-Python decile table."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.profiling import decile_lift
from ingestion_scripts_spark.operators.ranking import global_rank
from ingestion_scripts_spark.plan_audit import unbounded_global_windows

SF = "/root/testdata/sf0.001"


def _tie_df(spark, n=503, n_scores=3, seed=7):
    # heavy ties: only n_scores distinct scores, so almost every range
    # boundary falls INSIDE a tie run — the case where a missing unique
    # tiebreaker would scramble ranks
    rng = random.Random(seed)
    rows = [(rng.randrange(n_scores), i * 11 % n) for i in range(n)]
    return spark.createDataFrame(rows, "s int, id int")


def test_global_rank_bit_equal_to_naive_window(spark):
    df = _tie_df(spark)
    got = global_rank(df, [F.desc("s"), F.asc("id")], "rn", num_partitions=8)
    naive = df.withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("s"), F.asc("id"))).cast("bigint"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_global_rank_ascending_and_more_partitions_than_rows(spark):
    df = _tie_df(spark, n=17, n_scores=2)
    got = global_rank(df, [F.asc("s"), F.asc("id")], "rk", num_partitions=32)
    naive = df.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.asc("s"), F.asc("id"))).cast("bigint"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_global_rank_is_a_permutation(spark):
    df = _tie_df(spark, n=211, n_scores=1)  # ALL rows tie on score
    ranks = [
        r.rn
        for r in global_rank(
            df, [F.desc("s"), F.asc("id")], num_partitions=6
        ).collect()
    ]
    assert sorted(ranks) == list(range(1, 212))


def test_decile_lift_pure_python_reference(spark):
    rng = random.Random(41)
    rows = [(rng.randrange(50), rng.random() < 0.3, i) for i in range(997)]
    df = spark.createDataFrame(rows, "s int, y boolean, id int")
    got = {
        r.decile: (r.n_d, r.pos_d, r.cum_n, r.cum_pos, r.lift_micro)
        for r in decile_lift(df, F.col("s"), F.col("y"), "id").collect()
    }
    # independent reference: textbook sort + integer arithmetic
    ordered = sorted(rows, key=lambda t: (-t[0], t[2]))
    n, p = len(ordered), sum(1 for t in ordered if t[1])
    per = {}
    for rn, t in enumerate(ordered, start=1):
        d = (rn - 1) * 10 // n
        nd, pd = per.get(d, (0, 0))
        per[d] = (nd + 1, pd + int(t[1]))
    cum_n = cum_p = 0
    for d in sorted(per):
        nd, pd = per[d]
        cum_n += nd
        cum_p += pd
        lift = (cum_p * n * 1_000_000) // (cum_n * p)
        assert got[d] == (nd, pd, cum_n, cum_p, lift), f"decile {d}"
    assert set(got) == set(per)
    # bottom decile (full population) lift is exactly 1.0
    assert got[max(got)][4] == 1_000_000


def test_decile_lift_plan_has_no_unbounded_global_window(spark):
    import __spark_entry__ as E

    df = E.queries()["decile_lift"](spark, SF)
    assert unbounded_global_windows(df) == []


def test_plan_audit_flags_the_naive_shape(spark):
    # red path: the exact shape decile_lift used to plan — an
    # unpartitioned row_number straight over a parquet scan
    from ingestion_scripts_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    naive = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
    )
    hits = unbounded_global_windows(naive)
    assert len(hits) == 1 and "row_number" in hits[0]
    # green path: post-aggregate global windows stay allowed
    agg = docs.groupBy("n_chars").count()
    cum = agg.withColumn(
        "c", F.sum("count").over(Window.orderBy("n_chars"))
    )
    assert unbounded_global_windows(cum) == []


# --------------------------------------------------------- hypothesis laws

def test_global_rank_hypothesis_vs_naive_window(spark):
    """Property: for ARBITRARY multisets of scores (any tie structure,
    any sign, any skew) and any partition count, global_rank is
    bit-equal to the naive single-partition row_number. Hypothesis
    drives the data; the naive window is Spark's own ground truth.
    Hostile column names (the r9 weighted-median lesson): the frame
    uses names that differ from every internal alias."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        scores=st.lists(
            st.integers(min_value=-5, max_value=5), min_size=1, max_size=120
        ),
        nparts=st.sampled_from([1, 2, 3, 7, 16]),
    )
    def prop(scores, nparts):
        rows = [(s, i) for i, s in enumerate(scores)]
        df = spark.createDataFrame(rows, "the_score int, the_key int")
        got = global_rank(
            df,
            [F.desc("the_score"), F.asc("the_key")],
            "the_rank",
            num_partitions=nparts,
        )
        naive = df.withColumn(
            "the_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("the_score"), F.asc("the_key")))
            .cast("bigint"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, naive.collect())
        )

    prop()
