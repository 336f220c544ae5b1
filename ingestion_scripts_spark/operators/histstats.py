"""Exact order statistics off a maintained value-count histogram — the
incremental (two-snapshot) form of the corpus median / MAD / Gini family.

The 100 TB story: median, MAD and Gini are NOT additive, so they can't be
merged the way ``operators/ivm.py`` merges counts and sums — but the
per-distinct-value count histogram IS additive (it's just a keyed count),
and every exact order statistic of an integer column is a function of
that histogram alone. So the maintained view is the histogram:

    hist' = hist (+) counts(inserts) (-) counts(deletes)     [ivm.py]

and the statistics are recomputed from hist' — a table the size of the
VALUE DOMAIN (e.g. distinct cent amounts), not the corpus. A new batch of
10^9 rows updates the view by scanning only the delta; the stats pass
then touches only the histogram. This is the standard streaming-exact
design (a count histogram is a lossless quantile "sketch" for bounded
integer domains — cf. Dunning & Ertl's t-digest paper, which this family
deliberately does NOT use: exactness is the contract here).

Cumulative counts over the sorted value domain use
``ranking.global_cumsum`` (range shuffle + bounded offsets — never the
single-partition ``sum() over (order by value)``).

Exactness conventions (identical in the DuckDB twins):
- median is reported ×1e6 as ``(x_(k1) + x_(k2)) * 1e6 div 2`` with
  k1 = (n+1) div 2, k2 = (n+2) div 2 (lower/upper middle — the textbook
  even-n average, floor at the half-unit);
- MAD likewise over the |2x − 2·median| derived histogram (doubled to
  stay integral before the terminal div);
- Gini uses the rank-weighted sum identity on run-length ranks: a value
  v with count c ending at cumulative rank R contributes
  v·(c·R − c·(c−1)/2) to Σ rank·x, all in DECIMAL(38,0).

Reference scope: SURVEY.md §2.9 extension surface (the reference
pipeline has no incremental statistics; its Mongo sink overwrites
per-key documents — src/rss_consumer.py:60-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingestion_scripts_spark.caching import persist_tracked
from ingestion_scripts_spark.operators.ranking import global_cumsum

_D38 = "decimal(38,0)"


def value_counts(df: DataFrame, value_col: str, cnt_col: str = "cnt") -> DataFrame:
    """The additive histogram view: (value, cnt) per distinct value —
    one keyed aggregation with map-side partial combine; the maintainable
    input to ``ivm.incremental_merge(keys=[value_col], count_col=cnt_col)``."""
    return df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(cnt_col)
    )


def median_mad_gini_from_counts(
    hist: DataFrame,
    value_col: str,
    cnt_col: str = "cnt",
    num_partitions: int | None = None,
) -> DataFrame:
    """One row (n, total, median_micro, mad_micro, gini_ppm) of EXACT
    robust statistics computed from a (value, cnt) histogram — the
    histogram-sized recompute after an ``ivm.incremental_merge`` update.

    Requires a non-empty histogram with positive counts and non-negative
    integer values (Gini's denominator n·total must be > 0 — same
    degenerate-input contract as :func:`~.ranking.gini_coefficient`).

    Scale: two ``global_cumsum`` passes (value order, then deviation
    order) + broadcast 1-row probes — every stage parallel in the
    histogram size; the corpus itself is never touched.
    """
    clash = {"cum", "__n", "__tot", "__k1", "__k2", "__m2", "__d2"}.intersection(
        [value_col, cnt_col]
    )
    if clash:
        raise ValueError(
            f"median_mad_gini_from_counts reserved column names: {sorted(clash)}"
        )
    # the histogram feeds the first cumsum AND the deviation pass; its
    # lineage can be arbitrarily expensive (incremental_value_stats: three
    # shuffled aggregates full-outer-joined), while the frame itself is
    # histogram-sized by contract — persist it so the merge runs once
    # (optimization r14, guide §5: small + reused + expensive to recompute)
    hist = persist_tracked(hist)
    cum = global_cumsum(
        hist, [F.asc(value_col)], cnt_col, "cum", num_partitions=num_partitions
    )
    nt = cum.agg(
        F.sum(F.col(cnt_col).cast(_D38)).cast(_D38).alias("__n"),
        F.sum((F.col(value_col).cast(_D38) * F.col(cnt_col).cast(_D38)))
        .cast(_D38)
        .alias("__tot"),
    ).select(
        "__n",
        "__tot",
        F.expr("(__n + 1) div 2").cast(_D38).alias("__k1"),
        F.expr("(__n + 2) div 2").cast(_D38).alias("__k2"),
    )
    probed = cum.crossJoin(F.broadcast(nt))
    covers = lambda k: (F.col("cum") >= F.col(k)) & (  # noqa: E731
        F.col("cum") - F.col(cnt_col) < F.col(k)
    )
    med = probed.agg(
        F.max("__n").alias("__n"),
        F.max("__tot").alias("__tot"),
        F.max("__k1").alias("__k1"),
        F.max("__k2").alias("__k2"),
        F.min(F.when(covers("__k1"), F.col(value_col))).alias("__m1"),
        F.min(F.when(covers("__k2"), F.col(value_col))).alias("__m2x"),
        # Σ rank·x over the expanded multiset, run-length form
        F.sum(
            F.col(value_col).cast(_D38)
            * (
                F.col(cnt_col).cast(_D38) * F.col("cum")
                - F.expr(
                    f"CAST({cnt_col} AS DECIMAL(38,0))"
                    f" * (CAST({cnt_col} AS DECIMAL(38,0)) - 1) div 2"
                )
            )
        )
        .cast(_D38)
        .alias("__s"),
    ).select(
        "__n",
        "__tot",
        "__k1",
        "__k2",
        "__s",
        (F.col("__m1").cast(_D38) + F.col("__m2x").cast(_D38)).alias("__m2"),
    )
    # derived |2x − median_x2| histogram: integral deviations, re-aggregated
    # (distinct deviations can collide: |a−m| == |m−b|), then the second
    # cumulative pass picks the middle(s) of the deviation multiset
    dev = (
        hist.crossJoin(F.broadcast(med))
        .select(
            F.abs(
                F.lit(2).cast(_D38) * F.col(value_col).cast(_D38) - F.col("__m2")
            ).alias("__d2"),
            F.col(cnt_col),
        )
        .groupBy("__d2")
        .agg(F.sum(cnt_col).cast("bigint").alias(cnt_col))
    )
    dcum = global_cumsum(
        dev, [F.asc("__d2")], cnt_col, "cum", num_partitions=num_partitions
    )
    dmed = (
        dcum.crossJoin(F.broadcast(med.select("__k1", "__k2")))
        .agg(
            F.min(F.when(covers("__k1"), F.col("__d2"))).alias("__dm1"),
            F.min(F.when(covers("__k2"), F.col("__d2"))).alias("__dm2"),
        )
        .select(
            (F.col("__dm1").cast(_D38) + F.col("__dm2").cast(_D38)).alias("__d4")
        )
    )
    return (
        med.crossJoin(F.broadcast(dmed))
        .select(
            F.col("__n").cast("bigint").alias("n"),
            F.col("__tot").cast("bigint").alias("total"),
            F.expr("(__m2 * 1000000) div 2").cast("bigint").alias("median_micro"),
            F.expr("(__d4 * 1000000) div 4").cast("bigint").alias("mad_micro"),
            F.expr(
                "((2 * __s - (__n + 1) * __tot) * 1000000) div (__n * __tot)"
            )
            .cast("bigint")
            .alias("gini_ppm"),
        )
    )
