"""Exact duplicate-SPAN detection and removal planning over token streams.

The Spark-first re-expression of suffix-array substring deduplication
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): instead of one monolithic suffix array, every overlapping
k-token window of every document becomes a ``(span, doc_id, pos)``
posting row, and duplicated spans fall out of a keyed groupBy on the
span text. This catches the copy-paste boilerplate Jaccard/MinHash
resemblance misses (a 5-token licence header repeated across thousands
of otherwise-distinct documents never moves whole-document similarity).

Scale shape (100 TB):
- span posting generation is a narrow per-row transform (size(t)-k+1
  rows out per doc — linear fanout, no shuffle);
- duplicate detection is ONE keyed aggregation on the span value
  (map-side partial counts apply; shuffle key is hash-partitionable);
- removal planning ranks occurrences per span (window partitioned by
  span — no global sort) and counts covered token positions per doc
  (second keyed aggregation). Nothing is quadratic in corpus size, and
  no driver-side state exists.
- at production scale the span STRING would be replaced by xxhash64 of
  the span for the shuffle key (collision-checked on the value); the
  plain-text key is kept here so the DuckDB oracle can replay the law
  verbatim.

Reference scope: the reference pipeline (src/rss_consumer.py etc.) has
no substring dedup — this module is part of the SURVEY.md §2.9
LLM-curation extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.functions.text import tokenize_ws


def token_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """(id, pos, span) posting rows: every overlapping k-token window of
    ``lower(text)`` whitespace tokens, 1-based ``pos``. Documents shorter
    than k tokens emit nothing (the filter also dodges Spark's descending
    ``sequence(1, 0)`` footgun)."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        tokenize_ws(F.lower(F.col(text_col))).alias("__t"),
    ).where(F.size("__t") >= k)
    span = toks.select(
        "__id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__t) - {k - 1}), "
                f"i -> struct(i AS pos, array_join(slice(__t, i, {k}), ' ') AS span))"
            )
        ).alias("u"),
    )
    return span.select(
        F.col("__id").alias(id_col),
        F.col("u.pos").cast("bigint").alias("pos"),
        F.col("u.span").alias("span"),
    )


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_occ: int = 2,
) -> DataFrame:
    """Spans of exactly k tokens occurring >= min_occ times corpus-wide
    (same-document repeats count — a doc that repeats its own header is
    still duplication). Returns (span, n_occ, n_docs)."""
    occ = token_spans(docs, id_col, text_col, k)
    return (
        occ.groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .where(F.col("n_occ") >= min_occ)
    )


def span_removal_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document removal budget for exact-substring dedup: keep the
    globally FIRST occurrence (min (doc_id, pos)) of every duplicated
    span, mark every other occurrence's k token positions removable, and
    report per document how many distinct token positions that covers.

    Returns (id, n_tokens, n_removed, removed_ppm) for EVERY document
    (zero rows removed => n_removed = 0); removed_ppm is the exact
    integer parts-per-million n_removed*1e6 div n_tokens."""
    toks = docs.select(
        F.col(id_col).alias("__id"),
        tokenize_ws(F.lower(F.col(text_col))).alias("__t"),
    )
    occ = token_spans(docs, id_col, text_col, k).withColumnRenamed(id_col, "__id")
    w_span = Window.partitionBy("span").orderBy("__id", "pos")
    dup_occ = (
        occ.withColumn("rn", F.row_number().over(w_span))
        .withColumn("n_occ", F.count(F.lit(1)).over(Window.partitionBy("span")))
        .where((F.col("n_occ") >= 2) & (F.col("rn") >= 2))
    )
    covered = (
        dup_occ.select(
            "__id", F.explode(F.expr(f"sequence(pos, pos + {k - 1})")).alias("p")
        )
        .distinct()
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_removed"))
    )
    totals = toks.select("__id", F.size("__t").cast("bigint").alias("n_tokens"))
    out = (
        totals.join(covered, "__id", "left")
        .withColumn("n_removed", F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint"))
        .withColumn(
            "removed_ppm",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint")).otherwise(
                F.expr("CAST((n_removed * 1000000) DIV n_tokens AS BIGINT)")
            ),
        )
    )
    return out.select(
        F.col("__id").alias(id_col), "n_tokens", "n_removed", "removed_ppm"
    )
