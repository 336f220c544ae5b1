"""r3 batch 2: DQ expectations, UDTF sessionizer, VARIANT access,
accent stripping, EWMA fold law, URL canonicalization parity."""

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import dq

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- dq

def test_dq_checks_count_violations(spark):
    child = spark.createDataFrame(
        [(1, None, 5.0), (2, "x", -1.0), (2, "y", 3.0), (9, "z", 200.0)],
        "k int, s string, v double",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    rep = dq.dq_report(
        [
            dq.expect_not_null(child, "s"),
            dq.expect_unique(child, "k"),
            dq.expect_range(child, "v", 0, 100),
            dq.expect_fk(child, "k", parent, "pk"),
        ]
    ).collect()
    by_name = {r["check"]: r for r in rep}
    assert by_name["not_null:s"]["n_bad"] == 1
    assert by_name["unique:k"]["n_bad"] == 1  # 4 rows, 3 distinct
    assert by_name["range:v"]["n_bad"] == 2  # -1 and 200
    assert by_name["fk:k"]["n_bad"] == 1  # k=9 orphan
    assert all(r["n_total"] == 4 for r in rep)
    assert not any(r["passed"] for r in rep)


def test_dq_all_pass_on_clean_data(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    rep = dq.dq_report(
        [dq.expect_not_null(df, "s"), dq.expect_unique(df, "k")]
    ).collect()
    assert all(r["passed"] and r["n_bad"] == 0 for r in rep)


# ------------------------------------------------------- UDTF sessionizer

def test_udtf_sessionize_matches_window_form(spark):
    """The UDTF (per-partition imperative state) and the window cascade
    must implement the same 30-min-gap law on real event data."""
    import __spark_entry__ as E

    udtf_rows = {
        tuple(r)
        for r in E.q_sessionize_udtf(spark, SF_DIR).collect()
    }
    win_rows = {tuple(r) for r in E.q_sessionize(spark, SF_DIR).collect()}
    assert udtf_rows == win_rows


# ------------------------------------------------------------- VARIANT

def test_variant_get_typed_and_missing(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "s": "hi"}',), ('{"k": -3}',)], "props string"
    )
    v = df.select(F.parse_json("props").alias("v"))
    got = v.select(
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.variant_get("v", "$.s", "string").alias("s"),
        F.try_variant_get("v", "$.missing", "bigint").alias("m"),
    ).collect()
    assert [(r["k"], r["s"], r["m"]) for r in got] == [
        (7, "hi", None),
        (-3, None, None),
    ]


# ------------------------------------------------- strip_accents parity

@pytest.mark.parametrize(
    "s",
    ["thé cát", "ÁÉÖ ñ ü", "no accents", "", "mixé: 1,2; (x)"],
)
def test_strip_accents_matches_duckdb(spark, s):
    from ingestion_scripts_spark.functions.text import strip_accents_udf

    strip = strip_accents_udf()
    got = (
        spark.createDataFrame([(s,)], "t string")
        .select(strip("t").alias("o"))
        .collect()[0]["o"]
    )
    want = duckdb.sql("select strip_accents(?) s", params=[s]).fetchone()[0]
    assert got == want


# ------------------------------------------------------- EWMA fold law

def test_ewma_fold_matches_duckdb_list_reduce(spark):
    vals = [1.0, 2.5, -0.75, 10.0, 0.125]
    ewma = (
        spark.createDataFrame([(vals,)], "vs array<double>")
        .select(
            F.aggregate(
                "vs", F.lit(0.0), lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc
            ).alias("e")
        )
        .collect()[0]["e"]
    )
    want = duckdb.sql(
        "select list_reduce(list_prepend(0.0, ?::DOUBLE[]), "
        "(acc, x) -> 0.3*x + 0.7*acc) e",
        params=[vals],
    ).fetchone()[0]
    assert ewma == want  # identical IEEE op sequence → bit-identical


# ------------------------------------------- URL canonicalization parity

@pytest.mark.parametrize(
    "url",
    [
        "HTTPS://WWW.Host.COM/Path/a/5?id=2&utm_campaign=x#frag",
        "https://h.com/p/?utm_source=feed&id=1",
        "http://X.org/a",
        "https://h.com/p?id=1&ref=r",
    ],
)
def test_parse_url_vs_oracle_regexp(spark, url):
    host = F.lower(F.parse_url("u", F.lit("HOST")))
    path = F.regexp_replace(F.parse_url("u", F.lit("PATH")), "/$", "")
    q = F.coalesce(F.parse_url("u", F.lit("QUERY")), F.lit(""))
    got = (
        spark.createDataFrame([(url,)], "u string")
        .select(host.alias("h"), path.alias("p"), q.alias("q"))
        .collect()[0]
    )
    want = duckdb.sql(
        """
        select lower(regexp_extract(?, '^[A-Za-z]+://([^/?#]+)', 1)) h,
               regexp_replace(
                 regexp_extract(?, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                 '/$', '') p,
               regexp_extract(?, '\\?([^#]*)', 1) q
        """,
        params=[url, url, url],
    ).fetchone()
    assert (got["h"], got["p"], got["q"]) == want


# ------------------------------------------- setsim join & interval join

def test_setsim_prefix_filter_is_lossless(spark):
    """Prefix filtering must find EXACTLY the brute-force pairs."""
    from ingestion_scripts_spark.operators.setjoin import setsim_join

    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),   # J(1,2)=3/5=0.6
        (3, ["a", "b", "c", "d"]),   # J(1,3)=1.0
        (4, ["x", "y"]),
        (5, ["x", "y", "z"]),        # J(4,5)=2/3≈0.67
        (6, ["q"]),
    ]
    df = spark.createDataFrame(rows, "id int, tk array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in setsim_join(df, "id", "tk", t_num=6, t_den=10).collect()
    }
    # brute force at t=0.6
    import itertools

    want = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        if 10 * len(set(a) & set(b)) >= 6 * len(set(a) | set(b)):
            want.add((min(i, j), max(i, j)))
    assert got == want


def test_bucketed_interval_join_matches_bnl_form(spark):
    import __spark_entry__ as E

    bnl = {tuple(r) for r in E.q_interval_join_hot_hours(spark, SF_DIR).collect()}
    bkt = {tuple(r) for r in E.q_interval_join_bucketed(spark, SF_DIR).collect()}
    assert bnl == bkt


# ------------------------------------------------ sparse cosine pairs

def test_sparse_cosine_identical_docs_score_one(spark):
    from ingestion_scripts_spark.operators.similarity import sparse_cosine_pairs

    rows = [
        (1, ["a b c", "b c d", "c d e"]),
        (2, ["a b c", "b c d", "c d e"]),  # identical to 1
        (3, ["x y z"]),                    # disjoint
    ]
    df = spark.createDataFrame(rows, "id int, sh array<string>")
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in sparse_cosine_pairs(df, "id", "sh", min_cos_micro=100000).collect()
    }
    assert got[(1, 2)] == 1.0
    assert not any(3 in k for k in got)


def test_sliding_window_each_event_in_two_windows(spark):
    import __spark_entry__ as E
    from ingestion_scripts_spark.sources.readers import load_table

    windowed = sum(
        r["n"] for r in E.q_sliding_windows(spark, SF_DIR).collect()
    )
    base = load_table(spark, SF_DIR, "events").count()
    assert windowed == 2 * base
