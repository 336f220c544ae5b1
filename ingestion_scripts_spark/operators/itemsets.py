"""Frequent item-pair mining (the 2-itemset core of a-priori / market
basket analysis) over (basket, item) co-occurrence.

Pipeline relevance: pairwise co-occurrence with support and lift is the
standard "what goes together" primitive — co-purchased parts, co-cited
documents, co-occurring tags — and the same shape powers bigram-style
association mining over any keyed corpus.

Scale design (the a-priori pruning is the point):
- baskets are deduped to distinct ``(basket, item)`` first (multiplicity
  within a basket must not inflate support);
- item supports are computed once, and ONLY items whose own support
  reaches ``min_support`` enter the pair join — pair support can never
  exceed either item's support, so the prune is lossless. The frequent
  item set is small by construction and broadcast into the filter;
- the pair join is an equi-join on the basket key (never a cartesian):
  per-basket cost is C(basket_size, 2), bounded by the largest basket.
  Oversized baskets (carts with thousands of items) should be capped or
  salted by the caller — they are data-quality outliers for this
  analysis;
- lift is computed from exact BIGINT counts with one float divide,
  snapped to integer micro-units so ordering is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_support(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """All item pairs co-occurring in >= ``min_support`` baskets.

    Returns ``(item_a, item_b, pair_n, n_a, n_b, n_baskets, lift_micro)``
    with ``item_a < item_b``; ``lift_micro`` is
    ``floor(1e6 * pair_n * n_baskets / (n_a * n_b) + 0.5)`` — exact
    integer inputs, one IEEE divide, deterministic snap."""
    b = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()

    item_n = b.groupBy("it").agg(F.count(F.lit(1)).alias("n_it"))
    frequent = item_n.filter(F.col("n_it") >= min_support)
    # lossless a-priori prune: infrequent items cannot form frequent pairs
    fb = b.join(F.broadcast(frequent.select("it")), "it").select("bk", "it")

    x, y = fb.alias("x"), fb.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.it") < F.col("y.it")),
        )
        .groupBy(
            F.col("x.it").alias("item_a"), F.col("y.it").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_support)
    )

    n_baskets = b.select("bk").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    out = (
        pairs.join(
            F.broadcast(item_n.select(F.col("it").alias("item_a"),
                                      F.col("n_it").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("it").alias("item_b"),
                                      F.col("n_it").alias("n_b"))),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
        .withColumn(
            "lift_micro",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("pair_n")
                * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b"))
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .select(
            "item_a", "item_b", "pair_n", "n_a", "n_b", "n_baskets",
            "lift_micro",
        )
    )
    return out
