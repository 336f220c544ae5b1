"""Keyword extraction — the reference's only aggregation surface (A1 + A2).

Reference: ``tag_post`` (``src/reddit_consumer.py:139-155``) counts
canonicalized adjacent word pairs across all comments of one post with
``collections.Counter(pairwise(words)).most_common(5)``, then flattens the
top-5 pairs to a first-occurrence-deduped word list
(``structure_keywords``, ``src/reddit_consumer.py:74-77``).

Spark restatement (SURVEY.md §2.5): explode bigrams → per-(group, bigram)
hash count → windowed top-k → order-preserving re-nest. ``most_common(5)``
breaks ties by insertion order — non-deterministic across engines — so we
impose the documented deterministic tiebreak (count desc, bigram asc).

Scale: the groupBy and the window both hash-partition on the group key; at
100 TB the explode fan-out is the cost driver, and partial (map-side)
aggregation on (group, bigram) happens automatically in the hash aggregate.
AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import distinct_preserving_order, pairwise_bigrams


def bigram_topk(
    df: DataFrame,
    group_col: str,
    tokens_col: Column | str,
    k: int = 5,
) -> DataFrame:
    """A1 — per-group top-k canonical bigrams with deterministic tiebreak.

    Returns (group_col, bigram string "w1 w2", cnt, rank), rank 1..k.
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    exploded = (
        df.select(F.col(group_col), F.explode(pairwise_bigrams(tokens)).alias("pair"))
        .select(group_col, F.concat_ws(" ", F.col("pair")).alias("bigram"))
    )
    counted = exploded.groupBy(group_col, "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def structure_keywords(topk_df: DataFrame, group_col: str) -> DataFrame:
    """A2 — flatten ranked top-k bigrams into one first-occurrence-deduped
    word list per group (``list(dict.fromkeys(sum(pairs, ())))``,
    ``src/reddit_consumer.py:74-77``).

    Order inside the list follows rank order (the Counter's most_common
    order), enforced by sorting the collected (rank, bigram) structs before
    flattening — ``collect_list`` alone has no ordering guarantee after a
    shuffle.
    """
    return (
        topk_df.groupBy(group_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("rank", "bigram"))).alias("ranked")
        )
        .select(
            group_col,
            distinct_preserving_order(
                F.flatten(F.transform(F.col("ranked"), lambda r: F.split(r["bigram"], " ")))
            ).alias("keywords"),
        )
    )


def extract_keywords(
    df: DataFrame, group_col: str, tokens_col: Column | str, k: int = 5
) -> DataFrame:
    """A1+A2 composed: tokens → per-group keyword list (the full ``tag_post``
    semantics, ``src/reddit_consumer.py:139-155``)."""
    return structure_keywords(bigram_topk(df, group_col, tokens_col, k), group_col)


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Corpus-aware keyword extraction: per-doc top-k terms by TF-IDF.

    Plan (all keyed shuffles with map-side partial aggregation — the same
    shape at 100 TB):
      explode tokens → (doc, term) counts            [shuffle on (doc, term)]
      → doc lengths (sum of counts)                  [shuffle on doc]
      → document frequency per term                  [shuffle on term]
      → corpus size N as a 1-row agg, broadcast-joined (never collected)
      → score = tf · (ln((N+1)/(df+1)) + 1), rounded to 6 dp BEFORE the
        per-doc rank window (ties: term asc) so cross-engine float drift
        cannot flip a rank.

    Returns (id, term, tfidf, rank), rank 1..k.
    """
    from ..functions.text import tokenize_ws

    r6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    toks = df.select(
        F.col(id_col), F.explode(tokenize_ws(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("cnt"))
    doclen = tf.groupBy(id_col).agg(F.sum("cnt").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    n_docs = df.select(F.countDistinct(id_col).alias("nd"))
    scored = (
        tf.join(doclen, id_col)
        .join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            r6(
                (F.col("cnt") / F.col("dl"))
                * (F.log((F.col("nd") + 1.0) / (F.col("dfc") + 1.0)) + 1.0)
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
