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


def fd_strength(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Approximate functional-dependency profile for candidate
    ``determinant -> dependent`` column pairs — the schema-discovery /
    data-quality primitive (TANE/FDEP's g3 error, computed exactly):
    for each pair, the minimum number of rows that must be removed for
    the FD to hold is n_rows − Σ_groups max-per-dependent count.

    strength_ppm = (n_rows − violations)/n_rows in parts-per-million
    (exact integer arithmetic, truncating div); 1_000_000 ⟺ the FD
    holds exactly. Shape per pair: two cascaded aggregates — groupBy
    (det, dep) count, then groupBy det keeping max + sum — both
    map-side-combinable, never a row-level materialization; the per-pair
    reports (one row each) union into one frame.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    reports = []
    for det, dep in pairs:
        cells = df.groupBy(
            F.col(det).alias("k"), F.col(dep).alias("d")
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        per_k = cells.groupBy("k").agg(
            F.max("n").alias("keep_max"),
            F.sum("n").alias("n_k"),
            F.count(F.lit(1)).cast("bigint").alias("n_dep_values"),
        )
        reports.append(
            per_k.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum("n_k").cast("bigint").alias("n_rows"),
                (F.sum("n_k") - F.sum("keep_max")).cast("bigint").alias("violations"),
                F.max("n_dep_values").cast("bigint").alias("max_dep_values"),
                F.expr(
                    "(sum(keep_max) * 1000000) div sum(n_k)"
                ).cast("bigint").alias("strength_ppm"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
