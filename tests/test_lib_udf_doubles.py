"""Execute the lib-gated pandas_udf branches (vader / emoji / bs4 —
``functions/sentiment.py``; reference ``reddit_consumer.py:80-88``,
``twitter_consumer.py:89``, ``rss_consumer.py:106-111``) in a sandbox
where the real wheels cannot be installed (VERDICT r4 item 3).

Strategy: ship API-faithful test doubles (``tests/fakelibs/``) to Spark
workers via ``addPyFile`` and put them on the driver's sys.path, so the
factory's driver-side import AND the UDF body's worker-side import both
resolve — the whole Arrow-batched code path runs for real. Cleanup pops
the fakes from driver sys.path/sys.modules so every other test still sees
the libraries as absent (identity/native fallbacks stay pinned)."""

import importlib
import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F

FAKELIBS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fakelibs")
_MODS = ("vaderSentiment", "vaderSentiment.vaderSentiment", "emoji", "bs4")


@pytest.fixture
def fake_libs(spark, tmp_path):
    zip_base = str(tmp_path / "fakelibs")
    zip_path = shutil.make_archive(zip_base, "zip", FAKELIBS)
    # worker-side: distributed and appended to the worker sys.path
    spark.sparkContext.addPyFile(zip_path)
    # driver-side: factories import at UDF-construction time
    sys.path.insert(0, FAKELIBS)
    try:
        yield
    finally:
        # addPyFile ALSO inserts <SparkFiles root>/fakelibs.zip into the
        # DRIVER's sys.path for the rest of the session — scrub every
        # fakelibs-derived entry, or later tests (test_pipelines, ...) see
        # a fake `emoji` importable and take the lib-present branch
        # (r5 VERDICT item 2: session leak).
        zip_name = os.path.basename(zip_path)
        sys.path[:] = [
            p for p in sys.path if p != FAKELIBS and not p.endswith(zip_name)
        ]
        for m in _MODS:
            sys.modules.pop(m, None)
        importlib.invalidate_caches()


def test_vader_udf_branch_executes(spark, fake_libs):
    from ingestion_scripts_spark.functions.sentiment import make_sentiment_udf

    vader = make_sentiment_udf()
    assert vader is not None, "factory must see the (fake) lib"
    row = spark.range(1).select(
        vader(F.lit("this is great and awesome")).alias("s")
    ).collect()[0].s
    assert row.compound > 0
    assert abs(row.negative + row.neutral + row.positive - 1.0) < 1e-6


def test_demojize_udf_branch_executes(spark, fake_libs):
    from ingestion_scripts_spark.functions.sentiment import make_demojize_udf

    demojize = make_demojize_udf()
    assert demojize is not None
    out = spark.createDataFrame(
        [("ok \U0001F600",), (None,)], ["t"]
    ).select(demojize(F.col("t")).alias("t")).collect()
    vals = {r.t for r in out}
    assert "ok :grinning_face:" in vals and None in vals


def test_html_strip_udf_branch_executes(spark, fake_libs):
    from ingestion_scripts_spark.functions.sentiment import make_html_strip_udf

    strip = make_html_strip_udf()
    assert strip is not None
    out = spark.createDataFrame(
        [("<p>keep this</p><script>drop()</script><a href=x>link</a> tail",)],
        ["t"],
    ).select(strip(F.col("t")).alias("t")).collect()[0].t
    assert "keep this" in out and "tail" in out
    assert "drop" not in out and "link" not in out


def test_reddit_pipeline_runs_with_lib_udfs_active(spark, fake_libs):
    """Regression (r5 VERDICT item 1): with the emoji lib importable,
    reddit_pipeline must still ANALYZE and RUN — the demojize pandas_udf
    may not sit inside an F.transform lambda (Spark raises
    UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF); it must ride the
    posexplode→re-nest pass. Reference: reddit_consumer.py:124-136."""
    from pyspark.sql import Row

    from ingestion_scripts_spark.plans import pipelines as P
    from ingestion_scripts_spark.schemas import REDDIT_POST

    posts = spark.createDataFrame(
        [
            Row(
                id="p1", title="good news everyone", author=None,
                created="2023-03-04 05:06:07", score=10, upvote_ratio=0.9,
                reddit=None, domain=None, url=None,
                comments=[
                    Row(text="this is great \U0001F600 stuff", sentiment=None),
                    Row(text="terrible awful bad stuff", sentiment=None),
                ],
                keywords=None, sentiment=None,
            )
        ],
        REDDIT_POST,
    )
    out = P.reddit_pipeline(posts).collect()[0]
    # demojize ran (fake lib maps 😀 -> :grinning_face:); clean_text then
    # strips the punctuation, leaving the alias words as plain tokens
    assert "grinning" in out.comments[0].text
    assert out.comments[0].sentiment.compound > 0
    assert out.comments[1].sentiment.compound < 0


def test_fallbacks_restored_after_doubles(spark):
    """Runs in the same session AFTER the fixture tests: the driver must
    again see the libs as absent, so pipelines keep their pinned
    native/identity fallbacks (the rss/reddit oracles depend on it)."""
    from ingestion_scripts_spark.functions.sentiment import (
        make_demojize_udf,
        make_html_strip_udf,
        make_sentiment_udf,
    )

    for factory, lib in [
        (make_sentiment_udf, "vaderSentiment"),
        (make_demojize_udf, "emoji"),
        (make_html_strip_udf, "bs4"),
    ]:
        try:
            __import__(lib)
            installed = True
        except ImportError:
            installed = False
        assert (factory() is not None) == installed


def test_vader_double_normalization_matches_published_formula(fake_libs):
    """VERDICT r7/r8 item 7 (the honestly-verifiable half): the test
    double's COMPOUND normalization is VADER's published alpha-norm
    x/sqrt(x^2 + 15) (Hutto & Gilbert 2014, vaderSentiment 3.x
    ``normalize``), asserted against an independent evaluation for the
    raw valences a marker-count lexicon can produce. Lexicon VALUE
    parity (real VADER per-token valences) remains environment-blocked:
    no wheel/network in the container, and the double's fixed word sets
    are deliberately labeled fake — asserting remembered lexicon floats
    would be fabricated parity, so this test pins the formula, the
    contract shape, and monotonicity instead."""
    import math

    from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

    an = SentimentIntensityAnalyzer()
    # raw score -total..+total sweep: texts with k net positive markers
    for k in range(-4, 5):
        words = (["great"] * k) if k >= 0 else (["bad"] * (-k))
        text = " ".join(words + ["filler"])
        got = an.polarity_scores(text)["compound"]
        expected = round(k / math.sqrt(k * k + 15.0), 4)
        assert got == expected, (k, got, expected)
    # contract shape: the 4 keys, ranges, shares sum to ~1
    s = an.polarity_scores("great great bad day today")
    assert set(s) == {"neg", "neu", "pos", "compound"}
    assert -1.0 < s["compound"] < 1.0
    assert abs(s["neg"] + s["neu"] + s["pos"] - 1.0) < 2e-3
    # monotonicity: adding a positive marker never lowers compound
    base = an.polarity_scores("filler words only")["compound"]
    more = an.polarity_scores("filler words only great")["compound"]
    assert more >= base
