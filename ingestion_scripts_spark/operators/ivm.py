"""Incremental view maintenance for additive aggregates.

The 100 TB story: a materialized per-key aggregate (counts, sums — any
abelian-group measure) is NOT recomputed from the full fact table when
new rows arrive or old rows are retracted. The maintained view is

    view' = view (+) agg(inserts) (-) agg(deletes)

— three keyed aggregations (each with map-side partial combine) and one
outer merge join on the view key. Only the DELTA is scanned; the base
fact table is never touched again. The correctness gate for this module
is the IVM law itself: the incremental plan must equal a full recompute
bit-for-bit, which is exactly what the DuckDB oracle (a recompute over
base − deletes + inserts) checks.

Measures must be additive integers (counts, micro-unit sums) so the
merge is exact under any partitioning; keys whose maintained count
drops to zero leave the view (groups vanish on full delete, matching
recompute semantics).

Reference scope: SURVEY.md §2.9 extension surface (the reference's
Mongo upsert sink at src/rss_consumer.py:60-66 is an overwrite-per-key,
not an incremental aggregate).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_merge(
    base_agg: DataFrame,
    insert_agg: DataFrame,
    delete_agg: DataFrame,
    keys: list[str],
    count_col: str,
    measures: list[str],
) -> DataFrame:
    """view (+) agg(inserts) (-) agg(deletes), dropping keys whose count
    reaches zero. All three inputs carry ``keys + [count_col] + measures``
    as exact integers."""
    cols = [count_col, *measures]

    def tag(df: DataFrame, suffix: str) -> DataFrame:
        out = df
        for c in cols:
            out = out.withColumnRenamed(c, f"{c}{suffix}")
        return out

    merged = reduce(
        lambda a, b: a.join(b, keys, "full_outer"),
        [tag(base_agg, "_b"), tag(insert_agg, "_i"), tag(delete_agg, "_d")],
    )

    def comb(c: str):
        return (
            F.coalesce(F.col(f"{c}_b"), F.lit(0))
            + F.coalesce(F.col(f"{c}_i"), F.lit(0))
            - F.coalesce(F.col(f"{c}_d"), F.lit(0))
        ).cast("bigint").alias(c)

    return merged.select(*keys, *[comb(c) for c in cols]).where(
        F.col(count_col) > 0
    )
