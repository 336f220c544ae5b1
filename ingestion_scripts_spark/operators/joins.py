"""Join-family operators beyond plain equi-joins.

The reference's only join is the anti-join dedup (J1, ``operators/dedup.py``);
these are the engine extensions a large-scale pipeline needs: as-of
(event-time alignment) and blocked similarity joins live in
``operators/similarity.py`` / ``operators/dedup.py``.

Scale stance: the as-of join is the union-window formulation — ONE shuffle
on the join key, then a per-key ordered scan — instead of the naive
range-join (``l.ts >= r.ts`` theta-join) whose candidate set explodes
quadratically per key. This is the shape that survives 1000 executors: each
key's timeline is processed in one partition-local sorted pass, and skewed
keys can be salted upstream without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the latest right row
    of the same ``on`` key with ``right_ts <= left_ts`` (ties: the right row
    counts — '<=' like pandas ``merge_asof``).

    Implementation: tag both sides, union, window per key ordered by
    (ts, side) with ``last(..., ignorenulls=True)`` over an unbounded-
    preceding frame. Right columns come back as ``{prefix}{col}`` plus
    ``{prefix}{right_ts}``; unmatched left rows get nulls.
    """
    right_values = right_values or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    rv_struct = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_values]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rv_struct.alias("__rv"),
    )
    rv_type = r.schema["__rv"].dataType

    left_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    # align schemas for the union: right side carries nulls for left columns
    for c in left_cols:
        if c != on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = r.select(*l.columns).unionByName(l)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1).select(
        *left_cols,
        F.col(f"__m.{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_values],
    )
    return out
