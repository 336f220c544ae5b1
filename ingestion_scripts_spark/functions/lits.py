"""Cheap literal-array builders (optimization r14).

``F.array(*[F.lit(v) for v in vals])`` costs one py4j round-trip per
element — measured ~7 ms each, i.e. SECONDS of pure driver time per query
build for the 8×64 IVF centroid matrix or a 6×64 hyperplane set (the same
cost class ``clustering.assign_clusters`` documents for its k×dim matrix).
One ``F.expr`` SQL string is one round-trip and a fast JVM parse
(measured ~0.5 ms per 64-element array, ~60× cheaper than even the
``F.lit(list)`` single-literal form).

Value fidelity: doubles render as ``CAST('<repr>' AS DOUBLE)`` — Python
``repr`` round-trips the exact IEEE double through the SQL parser
(verified equal to the ``F.lit`` element build); integers render as plain
decimal BIGINT casts (exact). Strings go through ``F.lit(list)`` instead
of SQL text so no escaping rules apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_double_array(vals) -> str:
    """SQL text of an array<double> literal with bit-exact elements — for
    embedding into larger single-parse ``F.expr`` strings (the HOF-heavy
    expression builders in operators/similarity.py compose dozens of
    these; one string parse replaces hundreds of py4j calls)."""
    return "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) + ")"


def double_array(vals) -> Column:
    """array<double> literal — one expression, bit-exact elements."""
    return F.expr(sql_double_array(vals))


def bigint_array(vals) -> Column:
    """array<bigint> literal — one expression, exact int64 elements."""
    return F.expr(
        "array(" + ",".join(f"CAST({int(v)} AS BIGINT)" for v in vals) + ")"
    )


def string_array(vals) -> Column:
    """array<string> literal as ONE ``F.lit`` (no SQL-escaping concerns;
    still a single py4j call instead of one per element)."""
    return F.lit(list(vals))
