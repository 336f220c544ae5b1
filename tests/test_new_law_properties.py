"""Hypothesis property tests for the r3 cross-engine laws: EWMA fold,
accent stripping, and the integer-exact set-similarity threshold — the
same differential the driver runs, on adversarial generated inputs."""

import string

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

FINITE = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=20, deadline=None)
@given(st.lists(FINITE, min_size=1, max_size=30))
def test_ewma_fold_bit_identical(spark, vals):
    """F.aggregate left fold == DuckDB list_reduce with prepended init,
    bit-for-bit, for arbitrary finite doubles."""
    got = (
        spark.createDataFrame([(vals,)], "vs array<double>")
        .select(
            F.aggregate(
                "vs", F.lit(0.0), lambda a, x: F.lit(0.3) * x + F.lit(0.7) * a
            ).alias("e")
        )
        .collect()[0]["e"]
    )
    want = duckdb.sql(
        "select list_reduce(list_prepend(0.0, ?::DOUBLE[]), "
        "(acc, x) -> 0.3*x + 0.7*acc) e",
        params=[vals],
    ).fetchone()[0]
    assert got == want


LATIN = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;áéíóúàèìòùâêîôûäëïöüñçÁÉÍÓÚÄÖÜÑÇ",
    max_size=60,
)


@settings(max_examples=20, deadline=None)
@given(LATIN)
def test_strip_accents_matches_duckdb_on_latin(spark, s):
    from ingestion_scripts_spark.functions.text import strip_accents_udf

    strip = strip_accents_udf()
    got = (
        spark.createDataFrame([(s,)], "t string")
        .select(strip("t").alias("o"))
        .collect()[0]["o"]
    )
    want = duckdb.sql("select strip_accents(?) s", params=[s]).fetchone()[0]
    assert got == want


TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
    min_size=1,
    max_size=6,
    unique=True,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(TOKENS, min_size=2, max_size=8))
def test_setsim_join_matches_brute_force(spark, token_sets):
    """Prefix-filtered join finds exactly the pairs the integer Jaccard
    law admits, for arbitrary small token-set collections."""
    import itertools

    from ingestion_scripts_spark.operators.setjoin import setsim_join

    rows = list(enumerate(token_sets))
    df = spark.createDataFrame(rows, "id int, tk array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim_join(df, "id", "tk", t_num=6, t_den=10).collect()
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if 10 * len(set(a) & set(b)) >= 6 * len(set(a) | set(b))
    }
    assert got == want
