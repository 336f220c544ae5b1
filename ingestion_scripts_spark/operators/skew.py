"""Skew-handling operators — the patterns that keep hot keys from
serializing a 1000-executor job.

AQE's skew-join splitting handles sort-merge joins automatically; these
cover the two cases it does not:

- ``salted_count_distinct`` — COUNT(DISTINCT x) on a low-cardinality group
  key ships every distinct value of the hot group to one reducer. Salting
  by ``hash(x) % n`` partitions the *value space* disjointly, so per-salt
  distinct counts are exact and summable: two shuffles, both uniform.
- ``replicated_skew_join`` — a hot join key floods one task in a shuffled
  join. Left rows get a deterministic salt; the (small) right side is
  replicated across all salts; the join key becomes (key, salt) and fans
  the hot key across n tasks. Output is provably identical to the plain
  join (each left row meets each matching right row exactly once, in its
  own salt lane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Exact two-phase COUNT(DISTINCT distinct_col) per group.

    Salt = ``hash(distinct_col) % n_salts``: the same value always lands in
    the same salt, so salts partition the distinct-value space and the
    per-salt exact counts sum to the true distinct count.
    """
    out_col = out_col or f"n_distinct_{distinct_col}"
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts))
    per_salt = (
        df.groupBy(*group_cols, salt.alias("__salt"))
        .agg(F.countDistinct(distinct_col).alias("__d"))
    )
    return (
        per_salt.groupBy(*group_cols)
        .agg(F.sum("__d").cast("bigint").alias(out_col))
    )


def replicated_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_src: str | None = None,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys fanned across
    ``n_salts`` tasks; the right side is replicated n_salts times (keep it
    the smaller input). Salt is derived from a left column hash, so plans
    stay deterministic; the result is identical to ``left.join(right, on)``
    regardless of salt assignment (pinned by test)."""
    salt_src = salt_src or left.columns[0]
    l = left.withColumn(
        "__salt", F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [on, "__salt"], "inner").drop("__salt")
