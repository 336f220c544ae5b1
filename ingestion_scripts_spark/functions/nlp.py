"""NLP-ish enrichment — engine-native substitutes for newspaper3k (N3) and
the nested-comment sentiment pattern (N2).

The reference calls ``article.nlp()`` (newspaper3k TF-IDF-ish keywords +
sentence-scoring summary, ``src/rss_consumer.py:90-92,112-116,142-145``).
newspaper3k isn't installed here and isn't deterministic across versions, so
the engine's default is a native, deterministic substitute (SURVEY.md §2.7
N3): term-frequency top-k keywords and a first-k-sentences summary. Both are
pure Catalyst HOF expressions — per-row, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import clean_text, let_, remove_stopwords, tokenize_ws

#: one sentence: a run of non-terminators plus its trailing ./!/? run.
#: Extract-based (not lookbehind-split) so the IDENTICAL pattern runs on
#: DuckDB's RE2, which has no lookaround.
SENTENCE_PATTERN = "[^.!?]+[.!?]*"


def tf_top_tokens(toks: Column, k: int = 5) -> Column:
    """Top-k tokens by in-row term frequency; ties break token-ascending.

    Native trick: for each distinct token build struct(-count, token), sort
    ascending (so highest count first, then token asc), slice k. O(d^2) per
    row on distinct tokens — fine for document-sized rows, zero shuffle.
    """
    def body(t: Column) -> Column:
        scored = F.transform(
            F.array_distinct(t),
            lambda d: F.struct(
                (-F.size(F.filter(t, lambda x: x == d))).alias("neg_cnt"),
                d.alias("tok"),
            ),
        )
        top = F.slice(F.array_sort(scored), 1, k)
        return F.transform(top, lambda s: s["tok"])

    return let_(toks, body)


def keywords_native(text: Column, k: int = 5) -> Column:
    """N3 keyword substitute: clean → tokenize → stopword-filter → TF top-k."""
    return tf_top_tokens(remove_stopwords(tokenize_ws(clean_text(text))), k)


def summary_native(text: Column, k_sentences: int = 2) -> Column:
    """N3 summary substitute: first k sentences (deterministic; RE2-safe
    extract + trim so the DuckDB oracle computes the identical string)."""
    # single-arg lambda is load-bearing: passing F.trim directly lets
    # transform() bind its (element, index) pair to trim's optional
    # trim-characters parameter, silently stripping digits
    sentences = F.transform(
        F.regexp_extract_all(text, F.lit(SENTENCE_PATTERN), 0), lambda s: F.trim(s)
    )
    return F.concat_ws(" ", F.slice(sentences, 1, k_sentences))


def frequency_rank_summary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_sentences: int = 2,
) -> DataFrame:
    """Sentence-SCORING summary — the closer-to-newspaper3k variant of
    ``summary_native`` (VERDICT r3 item 8; reference
    ``rss_consumer.py:112-116`` ``article.nlp()`` summary).

    newspaper3k scores sentences by keyword weight and emits the top
    scorers in document order. Deterministic integer restatement: sentence
    score = Σ doc-level term frequency over the sentence's stopword-
    filtered tokens (an exact integer — no float anywhere), rank by
    (score DESC, position ASC), emit the top ``k_sentences`` joined in
    POSITION order. Documents with no sentences yield ''.

    Scale shape: two keyed aggregations (doc TF, sentence score) and one
    window partitioned by doc — everything shuffles on doc_id-derived
    keys; nothing global. Returns (id_col, summary).
    """
    sents = F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_PATTERN), 0),
        lambda s: F.trim(s),
    )
    # posexplode_outer keeps empty docs: they carry (pos NULL, sent NULL)
    # through scoring (score 0) so the final concat_ws yields ''
    ex = df.select(F.col(id_col).alias("__id"), F.posexplode_outer(sents).alias("__pos", "__sent"))
    tk = ex.select(
        "__id",
        "__pos",
        F.explode(remove_stopwords(tokenize_ws(clean_text(F.col("__sent"))))).alias("__w"),
    )
    tf = tk.groupBy("__id", "__w").agg(F.count(F.lit(1)).alias("__c"))
    scored = (
        tk.join(tf, ["__id", "__w"])
        .groupBy("__id", "__pos")
        .agg(F.sum("__c").alias("__score"))
    )
    w = Window.partitionBy("__id").orderBy(
        F.desc("__score"), F.asc_nulls_last("__pos")
    )
    ranked = (
        ex.join(scored, ["__id", "__pos"], "left")
        .withColumn("__score", F.coalesce(F.col("__score"), F.lit(0)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_sentences)
    )
    return ranked.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__sent"))),
                lambda s: s["__sent"],
            ),
            " ",
        ).alias("summary")
    ).select(F.col("__id").alias(id_col), "summary")


def enrich_nested_comments(
    df: DataFrame,
    id_col: str,
    comments_col: str,
    text_fn,
    out_field: str,
    sentiment_fn=None,
) -> DataFrame:
    """N2 — apply per-element transforms INSIDE an array-of-struct column,
    preserving element order.

    The reference mutates each comment dict in a Python loop
    (``src/reddit_consumer.py:114-116,129-131``). Natively: posexplode →
    transform → re-nest sorted by position (SURVEY.md §2.7 N2 option (a):
    scales, stays columnar; no UDF-in-``transform`` limitation).

    ``text_fn``: Column -> Column applied to each comment's ``text``;
    ``sentiment_fn``: optional Column -> Column(struct) stored at
    ``out_field``.
    """
    other_cols = [c for c in df.columns if c != comments_col]
    ex = df.select(*other_cols, F.posexplode_outer(comments_col).alias("__pos", "__c"))
    new_text = text_fn(F.col("__c.text")) if text_fn else F.col("__c.text")
    fields = [new_text.alias("text")]
    if sentiment_fn is not None:
        fields.append(sentiment_fn(F.col("__c.text")).alias(out_field))
    else:
        fields.append(F.col(f"__c.{out_field}").alias(out_field))
    rebuilt = ex.withColumn("__c2", F.when(F.col("__c").isNotNull(), F.struct(*fields)))
    renested = (
        rebuilt.groupBy(*other_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos").alias("p"), F.col("__c2").alias("c")))
            ).alias("__pc")
        )
        .withColumn(comments_col, F.transform(F.col("__pc"), lambda x: x["c"]))
        .drop("__pc")
    )
    return renested
