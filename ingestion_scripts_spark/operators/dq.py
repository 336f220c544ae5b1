"""Data-quality expectation checks (Great-Expectations-shaped, Spark-first).

Every ingestion pipeline needs a declarative gate before a load is
published: null fractions, key uniqueness, referential integrity, value
ranges. The reference validates records implicitly through its typed
record classes (src/records.py — faust.Record coercion rejects
malformed rows one at a time); at 100 TB the Spark-native equivalent is
a handful of whole-table aggregates, each a single map-side-combined
pass, unioned into one small report.

Scale notes
-----------
* Each check is one aggregate over the table — partial aggregation
  map-side, a few bytes per partition to the final reduce. No check
  materializes violations (count only); a ``violations_df`` escape hatch
  would just be the same filter without the agg.
* ``expect_fk`` is a LEFT ANTI join; the dimension side is broadcast
  when small (Spark/AQE decides — we don't force it, parent tables can
  be huge in a 100 TB star).
* The final report is a union of single-row DataFrames — trivially
  parallel, one job when the action runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report_row(name: str, n_bad: Column, n_total: Column, df: DataFrame) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"),
        n_bad.cast("bigint").alias("n_bad"),
        n_total.cast("bigint").alias("n_total"),
        (n_bad == 0).alias("passed"),
    )


def expect_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Single-row report: count of NULLs in ``col``."""
    return _report_row(
        name or f"not_null:{col}",
        F.count_if(F.col(col).isNull()),
        F.count(F.lit(1)),
        df,
    )


def expect_unique(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """Single-row report: duplicate-key count = n_rows - n_distinct.

    Exact ``count_distinct`` shuffles the key column once; for a 100 TB
    monitoring (non-gating) variant swap in ``approx_count_distinct``.
    """
    return _report_row(
        name or f"unique:{col}",
        F.count(col) - F.count_distinct(F.col(col)),
        F.count(F.lit(1)),
        df,
    )


def expect_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    """Single-row report: values outside [lo, hi] (NULLs are not violations
    — pair with ``expect_not_null`` to gate those)."""
    c = F.col(col)
    return _report_row(
        name or f"range:{col}",
        F.count_if(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))),
        F.count(F.lit(1)),
        df,
    )


def expect_fk(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Single-row report: child rows whose key has no parent.

    LEFT join against the distinct parent keys, then count the NULL
    matches — one declarative plan (no driver-side counts), so it unions
    into the report and runs as part of the same job as the other checks.
    """
    marked = child.select(F.col(child_key).alias("__ck")).join(
        parent.select(F.col(parent_key).alias("__ck")).distinct().withColumn(
            "__hit", F.lit(1)
        ),
        on="__ck",
        how="left",
    )
    return _report_row(
        name or f"fk:{child_key}",
        F.count_if(F.col("__hit").isNull()),
        F.count(F.lit(1)),
        marked,
    )


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the single-row check reports into one small DataFrame."""
    return reduce(DataFrame.unionByName, checks)
