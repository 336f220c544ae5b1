"""Exact set-similarity self-join with prefix filtering (PPJoin family).

MinHash-LSH (operators/dedup.py) answers *approximate* near-dup at scale;
this operator answers the EXACT-Jaccard variant without all-pairs work,
via the prefix-filtering principle (Chaudhuri et al., "A Primitive
Operator for Similarity Joins", ICDE 2006; Xiao et al., PPJoin, WWW 2008):

  order every record's tokens by a single global ordering (document
  frequency ascending — rarest first); if Jaccard(a, b) >= t, then the
  first ``|x| - ceil(t * |x|) + 1`` tokens of each side MUST share at
  least one token. Candidates therefore come from an equi-join on prefix
  tokens only, then exact verification runs on the candidate set.

Scale design
------------
* Prefix tokens are the RAREST tokens, so the candidate equi-join keys
  are low-frequency by construction — the inverted-index join avoids
  exactly the hot-token blowup a naive token join would hit.
* The length filter ``t·max(|a|,|b|) <= min(|a|,|b|)`` prunes candidates
  before verification.
* All threshold comparisons are EXACT integer arithmetic on a rational
  threshold t = t_num/t_den (``t_den·|a∩b| >= t_num·|a∪b|``): no float
  boundary can disagree between engines or executors.
* Shuffles: one by token (df counts + prefix join), one by id (ranking
  window), one by pair (verify join) — each on uniform keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.caching import persist_tracked


def setsim_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """All pairs with exact Jaccard(tokens) >= t_num/t_den.

    ``df`` must carry distinct token arrays in ``tokens_col``. Returns
    ``(id_a, id_b, n_inter, n_union)`` with ``id_a < id_b``.
    """
    # the token arrays are typically an expensive upstream chain
    # (tokenize → ngram → distinct); this plan consumes them THREE times
    # (prefix explode, verify-a, verify-b), so persist the materialized
    # arrays once (MEMORY_AND_DISK — spills, never OOMs, at corpus scale).
    # Tracked: the cache outlives this call (the returned plan is lazy);
    # harnesses release it via caching.release_caches() post-action.
    toks = persist_tracked(
        df.select(F.col(id_col).alias("__id"), F.col(tokens_col).alias("__tk"))
    )
    ex = toks.select(
        "__id", F.size("__tk").alias("__sz"), F.explode("__tk").alias("__tok")
    )
    dfreq = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    ranked = ex.join(dfreq, "__tok").withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__id").orderBy("__df", "__tok")),
    )
    # prefix length |x| - ceil(t*|x|) + 1, with ceil in exact integers
    ceil_t_sz = F.expr(f"({t_num} * __sz + {t_den - 1}) div {t_den}")
    prefix = ranked.filter(F.col("__rn") <= F.col("__sz") - ceil_t_sz + 1).select(
        "__tok", "__id", "__sz"
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__tok") == F.col("b.__tok"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (
                F.lit(t_num) * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
                <= F.lit(t_den) * F.least(F.col("a.__sz"), F.col("b.__sz"))
            ),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    ta = toks.select(F.col("__id").alias("id_a"), F.col("__tk").alias("__tka"))
    tb = toks.select(F.col("__id").alias("id_b"), F.col("__tk").alias("__tkb"))
    verified = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__tka", "__tkb")).alias("n_inter"),
            F.size(F.array_union("__tka", "__tkb")).alias("n_union"),
        )
        .filter(F.lit(t_den) * F.col("n_inter") >= F.lit(t_num) * F.col("n_union"))
    )
    return verified


def jaccard_col(n_inter: Column, n_union: Column) -> Column:
    """Reporting-only float Jaccard (the JOIN decision is integer-exact)."""
    return n_inter.cast("double") / n_union.cast("double")
