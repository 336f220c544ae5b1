"""Native datetime functions — F7-F11 of the reference surface.

All compile to built-in Catalyst expressions; JDK datetime patterns replace
``strptime`` formats (SURVEY.md §2.6, hard part iv).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference strptime formats → JDK patterns. Spark ≥3.0 forbids the
#: day-of-week field ``E`` in *parse* patterns, so the redundant leading
#: "EEE, " token is stripped before parsing instead of matched.
FMT_RFC822_NUMERIC_TZ = "dd MMM yyyy HH:mm:ss Z"  # %z branch
FMT_RFC822_NAMED_TZ = "dd MMM yyyy HH:mm:ss zzz"  # %Z branch
FMT_SIMPLE = "yyyy-MM-dd HH:mm:ss"  # reddit 'created' (src/reddit_consumer.py:162)
FMT_ZONED = "yyyy-MM-dd HH:mm:ssXXX"  # twitter 'created_at' (src/twitter_consumer.py:114)
FMT_ZONED_COMPACT = "yyyy-MM-dd HH:mm:ssZ"


def parse_rfc822(col: Column) -> Column:
    """F7 — RFC-822 date parse with the reference's tz branch: use the
    numeric-offset pattern iff the last whitespace token contains a digit
    (``src/rss_consumer.py:160-164``)."""
    body = F.regexp_replace(col, r"^[A-Za-z]+,\s*", "")
    tz_token = F.element_at(F.split(col, " "), -1)
    return F.when(
        F.regexp_like(tz_token, F.lit("\\d")),
        F.to_timestamp(body, FMT_RFC822_NUMERIC_TZ),
    ).otherwise(F.to_timestamp(body, FMT_RFC822_NAMED_TZ))


def struct_time_to_timestamp(col: Column) -> Column:
    """F8 — 9-int struct_time-style list → timestamp, dropping the trailing
    wday/yday entries: ``datetime(*published_parsed[:-2])``
    (``src/rss_consumer.py:158-159``)."""
    e = lambda i: F.element_at(col, i)  # noqa: E731
    return F.make_timestamp(e(1), e(2), e(3), e(4), e(5), e(6))


def parse_simple(col: Column) -> Column:
    """F9 — ``strptime(created, "%Y-%m-%d %H:%M:%S")``
    (``src/reddit_consumer.py:162``)."""
    return F.to_timestamp(col, FMT_SIMPLE)


def parse_zoned(col: Column) -> Column:
    """F10 — ``strptime(created_at, "%Y-%m-%d %H:%M:%S%z")``
    (``src/twitter_consumer.py:114``). Accepts ``+HH:MM`` or ``+HHMM``."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit(FMT_ZONED)),
        F.try_to_timestamp(col, F.lit(FMT_ZONED_COMPACT)),
    )


def audit_timestamp() -> Column:
    """F11 — ``insert_date`` audit column (``src/rss_consumer.py:165-166``)."""
    return F.current_timestamp()
