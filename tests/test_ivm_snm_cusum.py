"""Laws for operators/ivm.py, editdist.snm_candidate_pairs, and
profiling.cusum_changepoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import editdist as ED
from ingestion_scripts_spark.operators import ivm as IVM
from ingestion_scripts_spark.operators import profiling as PR


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )


def test_ivm_incremental_equals_recompute(spark):
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5), ("c", 7)], ["k", "v"]
    )
    inserts = spark.createDataFrame([("a", 10), ("d", 4)], ["k", "v"])
    deletes = spark.createDataFrame([("b", 5), ("a", 1)], ["k", "v"])
    got = {
        r["k"]: (r["n"], r["s"])
        for r in IVM.incremental_merge(
            _agg(base), _agg(inserts), _agg(deletes), ["k"], "n", ["s"]
        ).collect()
    }
    # recompute over base - deletes + inserts
    want = {"a": (2, 12), "c": (1, 7), "d": (1, 4)}
    assert got == want
    # 'b' vanished: its only base row was deleted -> count 0 -> dropped
    assert "b" not in got


def test_ivm_empty_deltas_is_identity(spark):
    base = spark.createDataFrame([("a", 3), ("b", 4)], ["k", "v"])
    empty = spark.createDataFrame([], "k string, v long")
    got = {
        r["k"]: (r["n"], r["s"])
        for r in IVM.incremental_merge(
            _agg(base), _agg(empty), _agg(empty), ["k"], "n", ["s"]
        ).collect()
    }
    assert got == {"a": (1, 3), "b": (1, 4)}


def test_snm_candidate_count_is_linear(spark):
    rows = [(i, f"k{i:03d}") for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "key"])
    # single band (same first char) -> exactly (n-1) + (n-2) pairs at w=2
    out = ED.snm_candidate_pairs(df, "id", "key", window=2).collect()
    assert len(out) == 19 + 18
    # every pair respects sort adjacency: id_b's key is the next or
    # next-next key in sorted order
    keys = {i: k for i, k in rows}
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    posn = {r[0]: i for i, r in enumerate(ordered)}
    for r in out:
        assert 1 <= posn[r["id_b"]] - posn[r["id_a"]] <= 2
        assert r["dist"] >= 0


def test_snm_banding_partitions_pairs(spark):
    rows = [(1, "ax"), (2, "ay"), (3, "bx"), (4, "by")]
    df = spark.createDataFrame(rows, ["id", "key"])
    out = ED.snm_candidate_pairs(df, "id", "key", window=2).collect()
    # no cross-band pairs: (1,2) in band a, (3,4) in band b only
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2), (3, 4)}


def test_cusum_finds_planted_shift(spark):
    # 20 points at 100 then 20 points at 200 -> |S_k| peaks exactly at k=20
    rows = [("g", i, 100.0 if i < 20 else 200.0) for i in range(40)]
    df = spark.createDataFrame(rows, ["grp", "idx", "val"])
    out = PR.cusum_changepoint(
        df, "grp", ["idx"], PR.snap_units(F.col("val"), 100)
    ).collect()[0]
    assert out["k_at_max"] == 20 and out["n"] == 40
    # brute-force the scaled statistic
    vals = [10000 if i < 20 else 20000 for i in range(40)]
    total = sum(vals)
    best = max(
        abs(40 * sum(vals[:k]) - k * total) for k in range(1, 41)
    )
    assert out["s_abs_max"] == best


def test_cusum_constant_series_is_flat_zero(spark):
    rows = [("g", i, 7.5) for i in range(10)]
    df = spark.createDataFrame(rows, ["grp", "idx", "val"])
    out = PR.cusum_changepoint(
        df, "grp", ["idx"], PR.snap_units(F.col("val"), 100)
    ).collect()[0]
    assert out["s_abs_max"] == 0 and out["k_at_max"] == 1  # tie -> min k
