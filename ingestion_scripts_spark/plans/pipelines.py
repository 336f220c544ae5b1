"""Pipeline composers — the three reference topologies as single DataFrame
DAGs (SURVEY.md §3).

The reference chains Faust agents through intermediate Kafka topics (every
stage hop = JSON serialize → broker → deserialize). Here each pipeline is ONE
lazy DataFrame program: Catalyst sees the whole plan, the diamond routing
(P3) is a ``when/otherwise``, and the only process boundaries left are the
shuffle (none in rss/twitter; one explode/re-nest in reddit) and the sink.

Each function takes record-shaped inputs (schemas.py) and returns the final
DataFrame that ``operators.sink.idempotent_append`` (or ``foreachBatch``)
writes — equivalent to the reference's Mongo collections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import persist_tracked
from ..functions import nlp
from ..functions.sentiment import make_demojize_udf, sentiment_native
from ..functions.text import (
    clean_text,
    extract_hashtags,
    html_strip_native,
    remove_stopwords,
    tokenize_ws,
)
from ..functions.timefns import parse_rfc822, parse_simple, parse_zoned, struct_time_to_timestamp
from ..operators.dedup import anti_join_dedup
from ..operators.keywords import extract_keywords


def rss_pipeline(
    feeds: DataFrame,
    existing_links: DataFrame,
    fetched_content: DataFrame | None = None,
) -> DataFrame:
    """RSS topology (``src/rss_consumer.py``): dedup → fetch → route →
    nlp-enrich → summary backfill → date normalize.

    Stage map (reference agent → here):
    - remove_old_articles (rss_consumer.py:68-74) → anti-join on ``link`` (J1)
    - fetch_content (77-98) → left join against ``fetched_content(link,
      content)`` — the offline model of the per-record HTTP fetch (S4);
      None → the feed's own ``content`` is used as-is
    - routing (86-93, P3): text present → keywords+summary; else treat
      content as HTML → strip (F4) → keywords+summary (fill_content, 101-123)
    - fill_summary_if_missing (126-149, P4): summary present → HTML-strip it;
      else first-sentences summary
    - write_feed_to_mongo date logic (152-169): published_parsed list wins,
      else RFC-822 parse with tz branch (F7/F8)
    """
    deduped = anti_join_dedup(feeds, existing_links, "link")

    if fetched_content is not None:
        fetched = fetched_content.select(
            F.col("link").alias("__link"), F.col("content").alias("__fetched")
        )
        # no broadcast hint: fetched-content has feed cardinality (one row
        # per fetched record) — AQE broadcasts at runtime iff actually small
        deduped = deduped.join(
            fetched, deduped.link == fetched.__link, "left"
        ).withColumn(
            "content", F.coalesce(F.col("__fetched"), F.col("content"))
        ).drop("__link", "__fetched")

    has_text = F.col("content").isNotNull() & (F.col("content") != "") & ~F.col(
        "content"
    ).rlike("<[^>]+>")
    # the P3 diamond as when/otherwise: no-text branch strips HTML first
    routed = deduped.withColumn(
        "content",
        F.when(has_text, F.col("content")).otherwise(
            html_strip_native(F.col("content"))
        ),
    )
    enriched = routed.withColumn(
        "tags", nlp.keywords_native(F.col("content"))
    ).withColumn(
        "summary",
        F.when(
            F.col("summary").isNotNull() & (F.col("summary") != ""),
            html_strip_native(F.col("summary")),
        ).otherwise(nlp.summary_native(F.col("content"))),
    )
    dated = enriched.withColumn(
        "published_ts",
        F.when(
            F.col("published_parsed").isNotNull()
            & (F.size(F.col("published_parsed")) >= 6),
            struct_time_to_timestamp(F.col("published_parsed")),
        ).otherwise(parse_rfc822(F.col("published"))),
    )
    return dated


def reddit_pipeline(posts: DataFrame) -> DataFrame:
    """Reddit topology (``src/reddit_consumer.py``): sentiment on title +
    every comment (N1/N2) → demojify+clean comments (F3/F1) → bigram top-5
    keywords across all comments (F5/F6/A1/A2) → date parse (F9).

    The reference flattens all comments' tokens into ONE stream before
    pairing (``itertools.chain`` at reddit_consumer.py:149), so bigrams span
    comment boundaries — reproduced via flatten() below.
    """
    demojize = make_demojize_udf()
    # A Python UDF may NOT appear inside a higher-order-function lambda
    # (Spark raises UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF at
    # analysis time — SURVEY.md §2.7 N2), so the demojize+clean leg rides
    # the same posexplode→re-nest pass as sentiment: there the comment text
    # is a top-level column and the pandas_udf is legal.
    text_clean = (
        (lambda c: clean_text(demojize(c))) if demojize else (lambda c: clean_text(c))
    )

    with_sent = posts.withColumn("sentiment", sentiment_native(F.col("title")))
    cleaned = nlp.enrich_nested_comments(
        with_sent, "id", "comments",
        text_fn=text_clean, out_field="sentiment", sentiment_fn=sentiment_native,
    )
    toks = cleaned.withColumn(
        "__toks",
        remove_stopwords(
            F.flatten(F.transform(F.col("comments"), lambda c: tokenize_ws(c["text"])))
        ),
    )
    # toks is consumed twice (keyword extraction AND the final join) and
    # carries the whole sentiment-enrich + clean chain — persist the
    # enriched rows once so the nested posexplode/re-nest runs one time
    # (tracked: released by caching.release_caches() after the action)
    toks = persist_tracked(toks)
    kw = extract_keywords(toks.select("id", "__toks"), "id", "__toks", k=5)
    out = (
        toks.drop("__toks", "keywords")
        .join(kw, "id", "left")
        .withColumn("created_ts", parse_simple(F.col("created")))
    )
    return out


def twitter_pipeline(tweets: DataFrame) -> DataFrame:
    """Twitter topology (``src/twitter_consumer.py``): sentiment (N1) →
    demojify (F3, identity fallback when the emoji lib is absent) → hashtags
    (F2) → zoned date parse (F10). Entirely narrow — zero shuffles."""
    demojize = make_demojize_udf()
    demojized = demojize(F.col("text")) if demojize else F.col("text")
    return (
        tweets.withColumn("sentiment", sentiment_native(F.col("text")))
        .withColumn("text", demojized)
        .withColumn("hashtags", extract_hashtags(F.col("text")))
        .withColumn("created_at_ts", parse_zoned(F.col("created_at")))
    )
