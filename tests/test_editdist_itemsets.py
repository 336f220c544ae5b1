"""qgram_edit_join losslessness vs brute force (incl. short strings where
the count filter cannot prune), pair_support a-priori prune correctness,
and triangle_stats vs hand-enumerated triangles."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.editdist import qgram_edit_join
from ingestion_scripts_spark.operators.graph import triangle_stats
from ingestion_scripts_spark.operators.itemsets import pair_support


def _brute_pairs(rows, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(sid BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    return {
        tuple(r)
        for r in con.execute(
            "SELECT a.sid, b.sid, levenshtein(a.name,b.name) FROM t a, t b "
            f"WHERE a.sid < b.sid AND levenshtein(a.name,b.name) <= {k}"
        ).fetchall()
    }


@pytest.mark.parametrize("k,q", [(1, 2), (2, 3), (2, 2)])
def test_qgram_edit_join_lossless(spark, k, q):
    names = [
        "red widget", "red widgets", "blue bolt", "blu bolt", "a", "b",
        "ab", "ba", "abc", "small ring", "hot gear", "hot bear", "zz", "z",
        "", "xy", "axy", "red  widget", "RED widget", "widget red",
    ]
    rows = [(i, n) for i, n in enumerate(dict.fromkeys(names))]
    df = spark.createDataFrame(rows, "sid bigint, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in qgram_edit_join(df, "sid", "name", k=k, q=q).collect()
    }
    assert got == _brute_pairs(rows, k)


def test_qgram_edit_join_no_cartesian_on_long_strings(spark):
    # the long-string path must be an equi-join on (gram, occ), never a
    # cross join of the full name table
    rows = [(i, f"longname-{i:04d}-suffix") for i in range(50)]
    df = spark.createDataFrame(rows, "sid bigint, name string")
    plan = qgram_edit_join(df, "sid", "name", k=1, q=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pair_support_counts_and_prune(spark):
    # baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4}; item 4 support 2, pair (3,4) once
    data = [
        (10, 1), (10, 2), (10, 3),
        (11, 1), (11, 2),
        (12, 1), (12, 2), (12, 4), (12, 4),  # dup row must not inflate
        (13, 3), (13, 4),
    ]
    df = spark.createDataFrame(data, "bk bigint, it bigint")
    out = {
        (r.item_a, r.item_b): (r.pair_n, r.n_a, r.n_b, r.n_baskets)
        for r in pair_support(df, "bk", "it", min_support=2).collect()
    }
    assert out == {(1, 2): (3, 3, 3, 4)}
    # lift = 3 * 4 / (3*3) = 1.3333.. -> 1333333
    row = pair_support(df, "bk", "it", min_support=2).collect()[0]
    assert row.lift_micro == 1333333


def test_triangle_stats_hand_case(spark):
    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r.node: (r.degree, r.triangles, r.cc_micro)
           for r in triangle_stats(df).collect()}
    assert got == {
        1: (3, 2, 666666),
        2: (3, 2, 666666),
        3: (2, 1, 1000000),
        4: (2, 1, 1000000),
    }
