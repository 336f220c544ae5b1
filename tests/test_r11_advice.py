"""r11 ADVICE closures: reserved-name guard on poisson_bootstrap_ci,
wedge-free transitivity NULL guard (both engines), and the documented
degenerate-input contracts of trimmed_mean / gini_coefficient."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import graph as G
from ingestion_scripts_spark.operators.bootstrap import poisson_bootstrap_ci
from ingestion_scripts_spark.operators.ranking import gini_coefficient, trimmed_mean


def test_bootstrap_reserved_name_guard(spark):
    df = spark.createDataFrame([(1, 10)], "b long, v long")
    with pytest.raises(ValueError, match="reserved"):
        poisson_bootstrap_ci(df, value_col="v", id_col="b")
    df2 = spark.createDataFrame([(1, 10)], "id long, __w long")
    with pytest.raises(ValueError, match="reserved"):
        poisson_bootstrap_ci(df2, value_col="__w", id_col="id")


def test_transitivity_wedge_free_graph_yields_null(spark):
    # perfect matching: every degree is 1 -> zero wedges; the terminal
    # division must yield NULL, not a Spark-NULL-vs-DuckDB-error divergence
    edges = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a long, b long")
    row = G.transitivity(edges, "a", "b").collect()[0]
    assert row["n_nodes"] == 6
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 0
    assert row["transitivity_ppm"] is None
    # the twin's guard idiom survives DuckDB semantics (// 0 errors there)
    got = duckdb.sql(
        "SELECT CASE WHEN 0 = 0 THEN NULL ELSE 1 // 0 END AS x"
    ).fetchone()
    assert got[0] is None


def test_transitivity_triangle_still_exact(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    row = G.transitivity(edges, "a", "b").collect()[0]
    assert (row["n_triangles"], row["n_wedges"]) == (1, 3)
    assert row["transitivity_ppm"] == 1_000_000


def test_trimmed_mean_degenerate_contract(spark):
    # documented: n <= 2k (here: empty input) -> ZERO rows on the Spark
    # side; the scalar-aggregate SQL twin shape (1 row of NULLs) diverges
    # by contract. This pin keeps the divergence conscious.
    empty = spark.createDataFrame([], "v long, id long")
    assert trimmed_mean(empty, "v", ["id"]).count() == 0
    # n == 2k exactly: nothing survives the trim -> zero rows too
    two = spark.createDataFrame([(1, 1), (9, 2)], "v long, id long")
    assert trimmed_mean(two, "v", ["id"], trim_num=1, trim_den=2).count() == 0
    # and one row past the boundary is well-defined again
    three = spark.createDataFrame([(1, 1), (5, 2), (9, 3)], "v long, id long")
    row = trimmed_mean(three, "v", ["id"], trim_num=1, trim_den=3).collect()[0]
    assert (row["n"], row["k_trim"]) == (3, 1)
    assert row["trimmed_mean_micro"] == 5_000_000


def test_gini_degenerate_contract(spark):
    # documented: empty input -> one row with n = NULL (global aggregate
    # over zero rows), where a count(*) twin would say n = 0
    empty = spark.createDataFrame([], "v long, id long")
    rows = gini_coefficient(empty, "v", ["id"]).collect()
    assert len(rows) == 1 and rows[0]["n"] is None
