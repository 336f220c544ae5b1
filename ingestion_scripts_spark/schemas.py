"""Explicit schemas — the engine never infers schemas on ingest.

Reference data model: Faust ``Record`` subclasses serialized as one JSON
object per Kafka message (reference ``src/records.py:1-47``). Required fields
are non-nullable there; optional fields default None. We mirror that as
explicit StructTypes (SURVEY.md §1.2-1.3), with the documented corrections:

- ``RssFeed.content`` is declared ``list`` in the reference but always
  assigned a string (``src/rss_consumer.py:85-87,111``) → StringType.
- ``sentiment`` dicts always have the 4-double shape
  ``{negative, neutral, positive, compound}``
  (``src/twitter_consumer.py:72-77``, ``src/reddit_consumer.py:83-88``).
- ``RedditPost.comments`` elements are ``{text, sentiment}`` structs
  (``src/reddit_consumer.py:114-116,129-131``).
"""

from __future__ import annotations

from pyspark.sql import types as T

SENTIMENT = T.StructType(
    [
        T.StructField("negative", T.DoubleType()),
        T.StructField("neutral", T.DoubleType()),
        T.StructField("positive", T.DoubleType()),
        T.StructField("compound", T.DoubleType()),
    ]
)

# reference src/records.py:4-16
RSS_FEED = T.StructType(
    [
        T.StructField("feed_source", T.StringType(), nullable=False),
        T.StructField("title", T.StringType(), nullable=False),
        T.StructField("link", T.StringType(), nullable=False),
        T.StructField("published", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("summary", T.StringType()),
        # 9-int struct_time-style list, consumed as datetime(*x[:-2])
        # (src/rss_consumer.py:158-159)
        T.StructField("published_parsed", T.ArrayType(T.IntegerType())),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("comments", T.StringType()),
        T.StructField("content", T.StringType()),  # corrected: string, not list
        T.StructField("source", T.MapType(T.StringType(), T.StringType())),
    ]
)

# reference src/records.py:23-32
TWEET = T.StructType(
    [
        T.StructField("tweet_id", T.StringType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("created_at", T.StringType(), nullable=False),
        T.StructField("metrics", T.MapType(T.StringType(), T.LongType())),
        T.StructField("author", T.MapType(T.StringType(), T.StringType())),
        T.StructField("trend", T.StringType(), nullable=False),
        T.StructField("place", T.StringType()),
        T.StructField("hashtags", T.ArrayType(T.StringType())),
        T.StructField("sentiment", SENTIMENT),
    ]
)

REDDIT_COMMENT = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("sentiment", SENTIMENT),
    ]
)

# reference src/records.py:35-47
REDDIT_POST = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("title", T.StringType(), nullable=False),
        T.StructField("author", T.MapType(T.StringType(), T.StringType())),
        T.StructField("created", T.StringType(), nullable=False),
        T.StructField("score", T.LongType(), nullable=False),
        T.StructField("upvote_ratio", T.DoubleType(), nullable=False),
        T.StructField("reddit", T.MapType(T.StringType(), T.StringType())),
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("comments", T.ArrayType(REDDIT_COMMENT)),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("sentiment", SENTIMENT),
    ]
)

#: driver testdata tables (FIXTURES.md §A) — names usable with
#: ``spark.read.parquet(f"{sf_dir}/{name}.parquet")``
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
