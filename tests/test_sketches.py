"""CMS sketch properties (HLL is covered in test_dedup + oracle checks):
never under-counts, mergeable cell-wise, estimates exact when no collision."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.sketches import cms_estimate, cms_sketch


def test_cms_never_undercounts(spark):
    rows = [(i % 17,) for i in range(300)]
    df = spark.createDataFrame(rows, "k bigint")
    sk = cms_sketch(df, "k", d=4, w=64)
    est = {
        r.k: r.est
        for r in cms_estimate(sk, df.select("k").distinct(), "k", d=4, w=64).collect()
    }
    true = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert set(est) == set(true)
    for k, n in true.items():
        assert est[k] >= n  # CMS overestimates, never under


def test_cms_sketch_is_bounded_and_mergeable(spark):
    a = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    b = spark.createDataFrame([(i,) for i in range(50, 150)], "k bigint")
    ska, skb = cms_sketch(a, "k", d=2, w=32), cms_sketch(b, "k", d=2, w=32)
    assert ska.count() <= 2 * 32
    merged = (
        ska.unionByName(skb)
        .groupBy("__row", "__col")
        .agg(F.sum("__n").alias("__n"))
    )
    direct = cms_sketch(a.unionByName(b), "k", d=2, w=32)
    got = {(r["__row"], r["__col"]): r["__n"] for r in merged.collect()}
    want = {(r["__row"], r["__col"]): r["__n"] for r in direct.collect()}
    assert got == want  # sketches add cell-wise == sketch of the union


def test_cms_estimate_broadcasts_sketch(spark):
    """The d*w-cell sketch must broadcast into the probe join — shuffling
    the probed key set against a <=1024-row sketch would be the wrong plan
    at any scale."""
    df = spark.createDataFrame([(i % 9,) for i in range(200)], "k bigint")
    sk = cms_sketch(df, "k", d=4, w=64)
    est = cms_estimate(sk, df.select("k").distinct(), "k", d=4, w=64)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_bloom_probe_broadcasts_filter(spark):
    """The bloom word table must broadcast; the probed keys must never
    shuffle for the membership test (only the final per-key min)."""
    from ingestion_scripts_spark.operators.dedup import (
        bloom_build,
        bloom_maybe_contains,
    )

    keys = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    out = bloom_maybe_contains(keys, bloom_build(keys, "k"), "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
