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

from ingestion_scripts_spark.caching import persist_tracked
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


def shared_span_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_docs_per_span: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs (id1 < id2) sharing at least one exact
    k-token span — the suffix-style candidate generator (distinct pairs
    only; one row per pair regardless of how many spans they share).

    ``max_docs_per_span`` is the standard frequency cap of banded
    similarity joins (boilerplate spans shared by thousands of documents
    would contribute O(docs²) pairs and say nothing about pairwise
    duplication — the same prune as setjoin's prefix-frequency filter
    and the n_docs cap in MinHash banding). Capped spans are DROPPED,
    documented, not silent: the operator's contract is "pairs sharing a
    RARE k-span", which is what substring-dedup triage wants.

    Scale: span posting explode (narrow) → per-(span, doc) distinct →
    span-keyed self-equi-join restricted to spans with
    2..max_docs_per_span docs — never an all-pairs product.
    """
    occ = (
        token_spans(docs, id_col, text_col, k)
        .select(F.col(id_col).alias("__id"), "span")
        .distinct()
    )
    freq = occ.groupBy("span").agg(F.countDistinct("__id").alias("__nd"))
    rare = freq.where(
        (F.col("__nd") >= 2) & (F.col("__nd") <= int(max_docs_per_span))
    ).select("span")
    # The rare-span posting list feeds BOTH sides of the self-join; the
    # span explode + distinct behind it is the dominant stage, and Spark
    # does not guarantee exchange reuse across the two branches — persist
    # the single frame so it is computed once (released per-query by the
    # harness via release_caches; ADVICE r11).
    rare_occ = persist_tracked(occ.join(rare, "span"))
    a = rare_occ.select("span", F.col("__id").alias("id1"))
    b = rare_occ.select("span", F.col("__id").alias("id2"))
    return (
        a.join(b, "span")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def longest_shared_span(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per candidate pair, the length (in tokens) of the LONGEST shared
    contiguous token run — exact substring-duplication profiling beyond
    fixed n-grams, the "how much is copied?" number behind suffix-array
    dedup (Lee et al. 2022) re-expressed relationally.

    Identity used: a shared run of L ≥ k tokens appears as L−k+1
    CONSECUTIVE matched k-span positions on a constant diagonal
    (pos1 − pos2); so per (pair, diagonal) the classic gaps-and-islands
    idiom (pos1 − row_number() is constant within a consecutive run)
    turns the longest run of matched k-spans into the longest shared
    span: lss = k − 1 + max_run. Pairs whose longest shared run is
    SHORTER than k match no k-span at all and report lss_tokens = 0
    (meaning "< k", not "exactly 0") — k is the operator's resolution
    floor, documented, same convention as duplicate_spans' min length.

    ``pairs`` carries (id1, id2); any candidate generator composes —
    :func:`shared_span_pairs`, MinHash banding, or an external list.

    Scale: span generation is restricted by semi-join to documents
    actually appearing in ``pairs``; the span match is an equi-join on
    (pair-side id, span); windows partition by (id1, id2, diag) —
    bounded by document length, never corpus-wide.
    """
    ids = (
        pairs.select(F.col("id1").alias("__id"))
        .union(pairs.select(F.col("id2")))
        .distinct()
    )
    occ = token_spans(
        docs.join(
            ids.withColumnRenamed("__id", id_col).hint("broadcast"),
            id_col,
            "left_semi",
        ),
        id_col,
        text_col,
        k,
    )
    o1 = occ.select(
        F.col(id_col).alias("id1"), F.col("pos").alias("p1"), "span"
    )
    o2 = occ.select(
        F.col(id_col).alias("id2"), F.col("pos").alias("p2"), "span"
    )
    matched = (
        pairs.join(o1, "id1")
        .join(o2, ["id2", "span"])
        .select("id1", "id2", "p1", "p2", (F.col("p1") - F.col("p2")).alias("diag"))
    )
    w = Window.partitionBy("id1", "id2", "diag").orderBy("p1")
    runs = (
        matched.withColumn(
            "island", F.col("p1") - F.row_number().over(w)
        )
        .groupBy("id1", "id2", "diag", "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("id1", "id2")
        .agg((F.max("run") + F.lit(k - 1)).cast("bigint").alias("lss_tokens"))
    )
    return pairs.join(runs, ["id1", "id2"], "left").select(
        "id1",
        "id2",
        F.coalesce(F.col("lss_tokens"), F.lit(0).cast("bigint")).alias(
            "lss_tokens"
        ),
    )


def span_removal_apply(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """The WRITE side of :func:`span_removal_plan` (suffix-span removal,
    VERDICT r11 item 5): emit every document with its removable duplicate
    -span token positions EXCISED — the rewrite step of exact-substring
    dedup (Lee et al. 2022 §4: keep one occurrence, cut the rest),
    whereas the plan only budgets it.

    Same coverage rule as the plan, so plan and apply agree row-for-row:
    the globally FIRST occurrence (min (doc_id, pos)) of each duplicated
    k-span stays; every other occurrence marks its k positions removable;
    a document's surviving tokens re-join with single spaces. The output
    token stream is the LOWERCASED whitespace stream (the span alphabet)
    — the conservation law ``len(tokenize(text_clean)) = n_tokens −
    n_removed`` is exact and tested.

    Returns (id, n_tokens, n_removed, text_clean) for EVERY document
    (documents with nothing to cut pass through re-joined).

    Scale shape: identical stages to the plan (span window partitioned
    by span — corpus-wide only per span key; coverage distinct is
    (doc, pos)-keyed) plus ONE extra per-doc stage: the removed-position
    set collects into a SORTED per-document array (bounded by document
    length, same bound every per-doc array op here already assumes) and a
    gap-walking ``aggregate`` HOF rebuilds the text JVM-side in
    O(n_tokens + n_removed) — no Python, no shuffle beyond the one keyed
    aggregation, no per-token membership probe.
    """
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
        .agg(F.array_sort(F.collect_list("p")).alias("__cov"))
    )
    out = (
        toks.join(covered, "__id", "left")
        .withColumn(
            "__cov", F.coalesce("__cov", F.expr("CAST(array() AS ARRAY<BIGINT>)"))
        )
        .select(
            "__id",
            F.size("__t").cast("bigint").alias("n_tokens"),
            F.size("__cov").cast("bigint").alias("n_removed"),
            # O(n_tokens + n_removed) rebuild (ADVICE r12): ``__cov`` is a
            # SORTED distinct position array, so walk its gaps once —
            # aggregate carries (next-uncovered-position, kept-slices) and
            # each step appends the token slice [nxt, c) strictly between
            # covered positions; the finisher appends the tail. The old
            # per-token ``NOT array_contains(__cov, p)`` filter was
            # O(n_tokens x n_removed) per document — quadratic on long,
            # heavily duplicated documents, the exact target of substring
            # dedup. Slice copies total at most n_tokens kept tokens.
            F.array_join(
                F.expr(
                    "aggregate(__cov, "
                    "struct(CAST(1 AS BIGINT) AS nxt, "
                    "CAST(array() AS ARRAY<STRING>) AS parts), "
                    "(acc, c) -> struct("
                    "c + CAST(1 AS BIGINT) AS nxt, "
                    "IF(c > acc.nxt, "
                    "concat(acc.parts, slice(__t, CAST(acc.nxt AS INT), "
                    "CAST(c - acc.nxt AS INT))), acc.parts) AS parts), "
                    "acc -> concat(acc.parts, "
                    "slice(__t, CAST(acc.nxt AS INT), "
                    "CAST(greatest(size(__t) - acc.nxt + 1, 0) AS INT))))"
                ),
                " ",
            ).alias("text_clean"),
        )
    )
    return out.withColumnRenamed("__id", id_col)
