"""Cross-engine parity for the vector bucketing primitives: random float
vectors through Spark lsh_bucket / ivf_cell / dot must equal the DuckDB
twins bit-for-bit (both sides are sequential folds over identical
literals)."""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark import oracle as O
from ingestion_scripts_spark.operators import similarity as SIM

DIM = 8
VEC = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=64),
    min_size=DIM, max_size=DIM,
)
PLANES = SIM.hyperplanes(4, DIM)
CENTS = SIM.ivf_centroids(4, DIM)


@settings(max_examples=8, deadline=None)
@given(vecs=st.lists(VEC, min_size=1, max_size=20))
def test_bucket_and_cell_parity(spark, vecs):
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "i int, v array<double>"
    )
    got = {
        r.i: (r.b, r.c)
        for r in sdf.select(
            "i",
            SIM.lsh_bucket(F.col("v"), PLANES).alias("b"),
            SIM.ivf_cell(F.col("v"), CENTS).alias("c"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(vecs)), "v": vecs}))
    expect = {
        i: (b, c)
        for i, b, c in con.execute(
            f"SELECT i, {O.sql_lsh_bucket('v', PLANES)}, "
            f"{O.sql_ivf_cell('v', CENTS)} FROM t"
        ).fetchall()
    }
    assert got == expect
