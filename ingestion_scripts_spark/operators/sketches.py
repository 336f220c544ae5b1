"""Deterministic distributed sketches (extension ops, SURVEY §2.9).

``hll_count_distinct`` — HyperLogLog with an md5-derived hash so the DuckDB
oracle computes the IDENTICAL registers and estimate (Spark's native
``approx_count_distinct`` is also HLL, but its xxhash64/seed internals are
not reproducible outside the JVM, so it can't be differential-tested).

Why this matters at 100 TB: exact COUNT(DISTINCT) shuffles every distinct
value; an HLL register set is m integers (m = 256 here) per group —
map-side partial, mergeable (max per register), one narrow shuffle. This is
the canonical sketch for cardinality dashboards over web-scale corpora.

Cross-engine determinism notes:
- registers are integers (max of leading-zero ranks) — exactly equal.
- ``sum(2^-M)`` adds dyadic rationals ≥ 2^-53 to a partial sum < m, which
  is exact in IEEE double for any realistic register value (rank ≤ ~45),
  so the sum is order-independent.
- the bias constant alpha_m is computed once in Python and embedded as the
  same literal in both plans; the final estimate is floor(x + 0.5) → bigint,
  eliminating float hashing from the output entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64

#: 60-bit md5-derived hash: low ``b`` bits pick the register, the remaining
#: ``60-b`` bits feed the leading-zero rank.
HASH_BITS = 60


def hll_alpha(m: int) -> float:
    """Standard HLL bias correction (Flajolet et al., AofA'07) for m ≥ 128."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 8,
    out_col: str = "n_hll",
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog
    (m = 2^b registers; standard error ≈ 1.04/sqrt(m) ≈ 6.5% at b=8).

    Plan: narrow map (hash → register index + rank) → groupBy(group, idx)
    max-agg (map-side partial: at most m rows per group leave each task)
    → groupBy(group) harmonic mean. Two keyed shuffles, both tiny.
    """
    m = 1 << b
    rank_bits = HASH_BITS - b
    h = hash64(F.col(value_col).cast("string"))
    idx = h % m
    w = F.shiftright(h, b)
    # rank = leading zeros in the rank_bits-wide value + 1
    #      = rank_bits - bit_length(w) + 1; bin() gives exact bit_length
    rho = F.when(w == 0, F.lit(rank_bits + 1)).otherwise(
        F.lit(rank_bits + 1) - F.length(F.bin(w))
    )
    regs = (
        df.select(*group_cols, idx.alias("__idx"), rho.alias("__rho"))
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rho").alias("__m"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__m"))).alias("__s"),
        F.count(F.lit(1)).alias("__nreg"),
    )
    alpha = hll_alpha(m)
    zeros = F.lit(m) - F.col("__nreg")  # registers never touched (value 0)
    raw = F.lit(alpha * m * m) / (F.col("__s") + zeros)
    # small-range (linear counting) correction below 2.5m with empty registers
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.floor(est + 0.5).cast("bigint").alias(out_col)
    )


def sql_hll_count_distinct(
    table_expr: str, group_col: str, value_expr: str, b: int = 8,
    out_col: str = "n_hll",
) -> str:
    """DuckDB twin of ``hll_count_distinct`` (same hash, same registers,
    same literal alpha). ``value_expr`` must already be VARCHAR."""
    from ..oracle import sql_hash64

    m = 1 << b
    rank_bits = HASH_BITS - b
    h = sql_hash64(value_expr)
    alpha_m2 = repr(hll_alpha(m) * m * m)
    return f"""
WITH __hashed AS (SELECT {group_col}, {h} AS h FROM {table_expr}),
__regs AS (
  SELECT {group_col}, h % {m} AS idx,
    CASE WHEN (h >> {b}) = 0 THEN {rank_bits + 1}
         ELSE {rank_bits + 1} - length(bin(h >> {b})) END AS rho
  FROM __hashed),
__mx AS (SELECT {group_col}, idx, max(rho) AS mr FROM __regs GROUP BY 1, 2),
__agg AS (
  SELECT {group_col}, sum(pow(2.0, -mr)) AS s, count(*) AS nreg
  FROM __mx GROUP BY 1)
SELECT {group_col},
  CAST(floor(CASE WHEN ({alpha_m2} / (s + ({m} - nreg))) <= {2.5 * m}
                   AND ({m} - nreg) > 0
              THEN {float(m)} * ln({float(m)} / ({m} - nreg))
              ELSE {alpha_m2} / (s + ({m} - nreg)) END + 0.5) AS BIGINT)
    AS {out_col}
FROM __agg
"""
