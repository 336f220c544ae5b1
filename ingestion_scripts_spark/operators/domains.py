"""Registrable-domain URL dedup — web-corpus curation at host granularity.

Composes the URL canonicalization rules (lowercase host, drop fragment,
strip ``utm_*`` tracking params, collapse trailing slashes — the same
pinned rules as the ``url_canonicalize`` query) with a registrable-domain
(eTLD+1) keyer and policy-ranked survivor dedup: one best capture per
canonical URL, reported per registrable domain. This is the standard
first pass of web-crawl curation (CommonCrawl-style pipelines dedup
by canonical URL before any content hashing; registrable domain is the
unit of crawl-politeness and of per-site quality priors).

Public-suffix handling: the real public-suffix list is a 9k-entry
Mozilla-maintained file; this module pins a SMALL frozen subset of
multi-label suffixes (the common ccTLD second-level registries) and
otherwise takes the last two labels. The frozen set is part of the
operator's contract — both engines (Spark and the DuckDB twin) evaluate
the identical set, and swapping in the full PSL is a data change, not a
code change (broadcast-join the list instead of the literal IN).

Scale shape: canonicalization is narrow per-row JVM expression work
(``parse_url`` + regex — no Python); survivor dedup is one keyed window
partitioned by canonical URL; the per-domain report is one keyed
aggregation. Nothing corpus-global, nothing quadratic.

Reference scope: SURVEY.md §2.9 extension surface (the reference's
feedparser pipeline keys articles by feed id — src/rss_consumer.py — and
has no URL-level dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: frozen multi-label public suffixes (common ccTLD second-level
#: registries). Contract constant — the DuckDB twin embeds the same set.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "co.in", "co.nz", "com.mx", "com.cn", "com.sg", "co.kr",
)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 of an already-lowercased host: last THREE labels when the
    last two form a pinned multi-label suffix (``example.co.uk``), else
    the last TWO (``example.com``); hosts with ≤ 2 labels pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def canonicalize_url(url: Column) -> tuple[Column, Column]:
    """(host, canonical_url): lowercase host, strip fragment, drop
    ``utm_*`` params, collapse trailing slashes — all JVM-side
    (``try_parse_url`` + higher-order ``filter``), no Python in the hot
    path.

    ``try_parse_url``, not ``parse_url``: Spark 4's ``parse_url`` raises
    INVALID_URL on ANY malformed URL, which would crash the whole job on
    real crawl data (ADVICE r11). Malformed rows yield NULL host here;
    :func:`domain_dedup` routes them out instead of failing. Trailing
    ``/+$`` (not ``/$``): repeated trailing slashes collapse, so
    ``/a//`` and ``/a/`` canonicalize identically — the pinned rule,
    identical regex in the DuckDB twin (ADVICE r11)."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    path = F.regexp_replace(F.try_parse_url(url, F.lit("PATH")), "/+$", "")
    q = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    keep = F.array_join(
        F.filter(F.split(q, "&"), lambda x: ~x.startswith("utm_")), "&"
    )
    canon = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(keep != "", F.concat(F.lit("?"), keep)).otherwise(F.lit("")),
    )
    return host, canon


def _with_url_keys(df: DataFrame, url_col: str) -> DataFrame:
    """``df`` plus (host, canon, domain), with malformed-URL rows
    ROUTED OUT: ``try_parse_url`` yields NULL host for unparseable URLs
    (and NULL/'' for schemeless strings), and crawl data always contains
    junk — dropping them here keeps the dedup pass total instead of
    crashing the job (ADVICE r11; Spark 4's ``parse_url`` raises
    INVALID_URL). Callers wanting the rejects use
    ``operators/sink.py::dead_letter_split`` on ``host IS NULL``
    upstream."""
    host, canon = canonicalize_url(F.col(url_col))
    return (
        df.withColumn("host", host)
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .withColumn("canon", canon)
        .withColumn("domain", registrable_domain(F.col("host")))
    )


def domain_dedup(
    df: DataFrame,
    url_col: str,
    prefer_desc: list[str],
    tiebreak_asc: list[str],
) -> DataFrame:
    """All columns of ``df`` plus (host, canon, domain), reduced to ONE
    policy-ranked survivor per canonical URL (highest ``prefer_desc``,
    then lowest ``tiebreak_asc`` — deterministic). The keyed-window twin
    of ``dedup.survivor_dedup`` with the key derived from the URL."""
    clash = {"host", "canon", "domain", "__rn"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"domain_dedup reserved column names in input: {sorted(clash)}"
        )
    base = _with_url_keys(df, url_col)
    w = Window.partitionBy("canon").orderBy(
        *[F.desc(c) for c in prefer_desc], *[F.asc(c) for c in tiebreak_asc]
    )
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def domain_dedup_stats(
    df: DataFrame,
    url_col: str,
    prefer_desc: list[str],
    tiebreak_asc: list[str],
    size_col: str,
) -> DataFrame:
    """Per registrable domain: capture count, canonical-URL count, the
    duplicated-capture fraction (ppm), and total survivor payload size —
    the per-site dedup report a crawl-curation pass emits.

    Returns (domain, n_urls, n_canonical, dup_ppm, kept_size) ordered by
    domain. ``dup_ppm = (n_urls − n_canonical)·1e6 div n_urls``.
    """
    base = _with_url_keys(df, url_col)
    w = Window.partitionBy("canon").orderBy(
        *[F.desc(c) for c in prefer_desc], *[F.asc(c) for c in tiebreak_asc]
    )
    ranked = base.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.count_distinct(F.col("canon")).cast("bigint").alias("n_canonical"),
            F.sum(F.when(F.col("__rn") == 1, F.col(size_col)).otherwise(0))
            .cast("bigint")
            .alias("kept_size"),
        )
        .select(
            "domain",
            "n_urls",
            "n_canonical",
            F.expr("((n_urls - n_canonical) * 1000000) div n_urls")
            .cast("bigint")
            .alias("dup_ppm"),
            "kept_size",
        )
        .orderBy("domain")
    )
