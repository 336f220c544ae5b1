"""Bucketed-table helpers — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-to-fact join (e.g. lineitem ⋈ orders)
is the shuffle of both sides. Writing both tables bucketed (and sorted) by
the join key with the SAME bucket count lets Spark plan a SortMergeJoin with
ZERO Exchange operators: each task reads matching bucket files from both
sides. The test pins this property on the physical plan.

Bucket-count guidance: pick so one bucket of the larger table is a few
hundred MB (bucket files are the unit of read parallelism and of the
bucket-wise join); both sides MUST use the same count or Spark falls back
to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets lets SortMergeJoin skip its sort too — the join
    becomes a pure streaming merge of pre-sorted bucket files.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange when bucket specs line up (pinned by test)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout: one directory per partition
    value. Queries filtering on the partition column read ONLY matching
    directories (partition pruning — the scan never opens other files).
    Partition on low-cardinality, frequently-filtered columns; high-
    cardinality keys belong in buckets, not partitions (small-files blowup).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
