"""Pin F7-F10 datetime parsing against the reference's strptime semantics
(``src/rss_consumer.py:158-164``, ``src/reddit_consumer.py:162``,
``src/twitter_consumer.py:114``)."""

import datetime

from pyspark.sql import functions as F

from ingestion_scripts_spark.functions import timefns as TF


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_rfc822_numeric_offset_branch(spark):
    # tz token contains a digit → %z branch
    v = _one(spark, TF.parse_rfc822(F.lit("Mon, 02 Jan 2023 10:20:30 +0200")))
    assert v == datetime.datetime(2023, 1, 2, 8, 20, 30)  # UTC session tz


def test_rfc822_named_zone_branch(spark):
    v = _one(spark, TF.parse_rfc822(F.lit("Mon, 02 Jan 2023 10:20:30 UTC")))
    assert v == datetime.datetime(2023, 1, 2, 10, 20, 30)


def test_struct_time_list(spark):
    # datetime(*x[:-2]) — 9-int struct_time drops wday/yday
    lst = F.array(*[F.lit(x) for x in [2023, 5, 17, 1, 2, 3, 9, 9, 9]])
    assert _one(spark, TF.struct_time_to_timestamp(lst)) == datetime.datetime(
        2023, 5, 17, 1, 2, 3
    )


def test_parse_simple(spark):
    assert _one(spark, TF.parse_simple(F.lit("2021-12-31 23:59:58"))) == (
        datetime.datetime(2021, 12, 31, 23, 59, 58)
    )


def test_parse_zoned(spark):
    assert _one(spark, TF.parse_zoned(F.lit("2021-06-01 12:00:00+02:00"))) == (
        datetime.datetime(2021, 6, 1, 10, 0, 0)
    )
    assert _one(spark, TF.parse_zoned(F.lit("2021-06-01 12:00:00+0000"))) == (
        datetime.datetime(2021, 6, 1, 12, 0, 0)
    )


def test_roundtrip_property(spark):
    """format → parse → format is identity for a spread of timestamps
    (all four parse paths), incl. second boundaries and month edges."""
    from pyspark.sql import functions as F

    from ingestion_scripts_spark.functions import timefns as TF

    base = spark.range(0, 200).select(
        F.timestamp_seconds(
            F.lit(1700000000) + F.col("id") * 86461 + (F.col("id") % 60)
        ).alias("ts")
    )
    checks = base.select(
        (TF.parse_simple(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")) == F.col("ts")).alias("a"),
        (TF.parse_zoned(F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), F.lit("+00:00"))) == F.col("ts")).alias("b"),
        (TF.parse_rfc822(F.concat(F.date_format("ts", "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" +0000"))) == F.col("ts")).alias("c"),
        (TF.parse_rfc822(F.concat(F.date_format("ts", "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" UTC"))) == F.col("ts")).alias("d"),
        (TF.struct_time_to_timestamp(
            F.array(F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
                    F.hour("ts"), F.minute("ts"), F.second("ts"),
                    F.lit(0), F.lit(0), F.lit(0))) == F.col("ts")).alias("e"),
    )
    agg = checks.agg(*[F.min(c).alias(c) for c in "abcde"]).collect()[0]
    assert all([agg.a, agg.b, agg.c, agg.d, agg.e]), agg
