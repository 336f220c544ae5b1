"""End-to-end pipeline composition tests on reference-shaped fixture records
(FIXTURES.md §B shapes)."""

import datetime

from pyspark.sql import Row, functions as F

from ingestion_scripts_spark.plans import pipelines as P
from ingestion_scripts_spark.schemas import REDDIT_POST, RSS_FEED, TWEET


def _rss_rows():
    return [
        Row(
            feed_source="feedA", title="T1", link="l1",
            published="Mon, 02 Jan 2023 10:20:30 +0000", author=None,
            summary=None, published_parsed=None, authors=None, tags=None,
            comments=None,
            content="Spark engines process data fast. Spark scales. The end.",
            source=None,
        ),
        Row(
            feed_source="feedA", title="T2", link="l2",
            published=None, author=None, summary="<p>prebuilt <b>summary</b></p>",
            published_parsed=[2023, 5, 17, 1, 2, 3, 9, 9, 9], authors=None,
            tags=None, comments=None,
            content="<html><body><p>html only body text</p></body></html>",
            source=None,
        ),
        Row(  # duplicate link — must be dropped by J1
            feed_source="feedB", title="T3", link="seen",
            published=None, author=None, summary=None, published_parsed=None,
            authors=None, tags=None, comments=None, content="x", source=None,
        ),
    ]


def test_rss_pipeline(spark):
    feeds = spark.createDataFrame(_rss_rows(), RSS_FEED)
    existing = spark.createDataFrame([("seen",)], "link string")
    out = P.rss_pipeline(feeds, existing).collect()
    by_link = {r.link: r for r in out}
    assert set(by_link) == {"l1", "l2"}  # J1 dropped the duplicate
    # text branch: keywords + first-sentences summary
    assert by_link["l1"].tags and "spark" in by_link["l1"].tags
    assert by_link["l1"].summary.startswith("Spark engines process data fast.")
    assert by_link["l1"].published_ts == datetime.datetime(2023, 1, 2, 10, 20, 30)
    # html branch: stripped; existing summary html-stripped; struct_time wins
    assert "<" not in by_link["l2"].content
    assert by_link["l2"].summary == "prebuilt summary"
    assert by_link["l2"].published_ts == datetime.datetime(2023, 5, 17, 1, 2, 3)


def test_reddit_pipeline(spark):
    posts = spark.createDataFrame(
        [
            Row(
                id="p1", title="good news everyone", author=None,
                created="2023-03-04 05:06:07", score=10, upvote_ratio=0.9,
                reddit=None, domain=None, url=None,
                comments=[
                    Row(text="this is great great stuff", sentiment=None),
                    Row(text="terrible awful bad stuff", sentiment=None),
                ],
                keywords=None, sentiment=None,
            )
        ],
        REDDIT_POST,
    )
    out = P.reddit_pipeline(posts).collect()[0]
    assert out.sentiment.compound > 0  # 'good' in title
    assert out.comments[0].sentiment.compound > 0
    assert out.comments[1].sentiment.compound < 0
    # comments cleaned AFTER sentiment; clean_text lowercases
    assert out.comments[0].text == "this is great great stuff"
    assert out.created_ts == datetime.datetime(2023, 3, 4, 5, 6, 7)
    assert out.keywords is not None and len(out.keywords) > 0
    # bigrams span comment boundaries (itertools.chain parity):
    # 'stuff'(end of c0) + 'terrible'(start of c1) may pair — presence of any
    # keyword from the flattened stream is enough here; exact A1 semantics are
    # pinned in test_keywords.py


def test_twitter_pipeline(spark):
    tweets = spark.createDataFrame(
        [
            Row(
                tweet_id="t1", text="I love #Spark it is great #bigdata",
                created_at="2023-01-01 00:00:00+00:00", metrics=None,
                author=None, trend="x", place=None, hashtags=None, sentiment=None,
            )
        ],
        TWEET,
    )
    out = P.twitter_pipeline(tweets).collect()[0]
    assert out.hashtags == ["Spark", "bigdata"]
    assert out.sentiment.compound > 0
    assert out.created_at_ts == datetime.datetime(2023, 1, 1, 0, 0, 0)


def test_frequency_rank_summary_scores_and_edges(spark):
    from ingestion_scripts_spark.functions.nlp import frequency_rank_summary

    rows = [
        # "alpha" dominates doc TF -> both alpha sentences outscore the
        # beta one; output preserves DOCUMENT order of the winners
        (1, "Alpha alpha wins here. Beta sentence. Alpha again wins."),
        # tie on score -> earlier position wins
        (2, "One common. Two common."),
        (3, ""),  # no sentences -> ''
        (4, None),  # null text -> ''
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.summary
        for r in frequency_rank_summary(df, "doc_id", "text", 2).collect()
    }
    assert got[1] == "Alpha alpha wins here. Alpha again wins."
    assert got[2] == "One common. Two common."
    assert got[3] == ""
    assert got[4] == ""
