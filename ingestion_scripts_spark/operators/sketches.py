"""Deterministic distributed sketches (extension ops, SURVEY §2.9).

``hll_count_distinct`` — HyperLogLog with an md5-derived hash so the DuckDB
oracle computes the IDENTICAL registers and estimate (Spark's native
``approx_count_distinct`` is also HLL, but its xxhash64/seed internals are
not reproducible outside the JVM, so it can't be differential-tested).

Why this matters at 100 TB: exact COUNT(DISTINCT) shuffles every distinct
value; an HLL register set is m integers (m = 256 here) per group —
map-side partial, mergeable (max per register), one narrow shuffle. This is
the canonical sketch for cardinality dashboards over web-scale corpora.

The registers/estimate split (``hll_registers`` / ``hll_estimate``) exposes
the MERGE property directly: registers for any union of groups are the
element-wise max of the groups' registers, so rollups across dimensions
never rescan data — exactly how a sketch warehouse serves "distinct users
overall" from per-segment sketches.

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


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, b: int = 8
) -> DataFrame:
    """Per-group HLL registers: (group..., __idx, __m). Narrow map (hash →
    register index + rank) then a groupBy max — map-side partial means at
    most m rows per group leave each task."""
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
    return (
        df.select(*group_cols, idx.alias("__idx"), rho.alias("__rho"))
        .groupBy(*group_cols, "__idx")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], b: int = 8, out_col: str = "n_hll"
) -> DataFrame:
    """Registers → cardinality estimate per group (harmonic mean + linear
    counting below 2.5m with empty registers)."""
    m = 1 << b
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__m"))).alias("__s"),
        F.count(F.lit(1)).alias("__nreg"),
    )
    alpha = hll_alpha(m)
    zeros = F.lit(m) - F.col("__nreg")  # registers never touched (value 0)
    raw = F.lit(alpha * m * m) / (F.col("__s") + zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.floor(est + 0.5).cast("bigint").alias(out_col)
    )


def hll_merge(regs: DataFrame, to_cols: list[str]) -> DataFrame:
    """Merge registers across dropped group dimensions: element-wise max —
    the union-of-sets operation, NO rescan of the base data."""
    return regs.groupBy(*to_cols, "__idx").agg(F.max("__m").alias("__m"))


def hll_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    b: int = 8,
    out_col: str = "n_hll",
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog
    (m = 2^b registers; standard error ≈ 1.04/sqrt(m) ≈ 6.5% at b=8).

    Plan: narrow map → groupBy(group, idx) max-agg → groupBy(group)
    harmonic mean. Two keyed shuffles, both tiny.
    """
    return hll_estimate(
        hll_registers(df, group_cols, value_col, b), group_cols, b, out_col
    )


def sql_hll_registers(
    table_expr: str, group_col: str, value_expr: str, b: int = 8
) -> str:
    """DuckDB twin of ``hll_registers`` (same hash, same registers)."""
    from ..oracle import sql_hash64

    m = 1 << b
    rank_bits = HASH_BITS - b
    h = sql_hash64(value_expr)
    return f"""
SELECT {group_col}, h % {m} AS idx,
       max(CASE WHEN (h >> {b}) = 0 THEN {rank_bits + 1}
                ELSE {rank_bits + 1} - length(bin(h >> {b})) END) AS mr
FROM (SELECT {group_col}, {h} AS h FROM {table_expr})
GROUP BY 1, 2"""


def sql_hll_estimate(
    regs_expr: str, group_col: str, b: int = 8, out_col: str = "n_hll"
) -> str:
    """DuckDB twin of ``hll_estimate`` over a registers relation
    (columns: group, idx, mr)."""
    m = 1 << b
    alpha_m2 = repr(hll_alpha(m) * m * m)
    return f"""
SELECT {group_col},
  CAST(floor(CASE WHEN ({alpha_m2} / (s + ({m} - nreg))) <= {2.5 * m}
                   AND ({m} - nreg) > 0
              THEN {float(m)} * ln({float(m)} / ({m} - nreg))
              ELSE {alpha_m2} / (s + ({m} - nreg)) END + 0.5) AS BIGINT)
    AS {out_col}
FROM (SELECT {group_col}, sum(pow(2.0, -mr)) AS s, count(*) AS nreg
      FROM {regs_expr} GROUP BY 1)"""


def sql_hll_count_distinct(
    table_expr: str, group_col: str, value_expr: str, b: int = 8,
    out_col: str = "n_hll",
) -> str:
    """DuckDB twin of ``hll_count_distinct`` (same hash, same registers,
    same literal alpha). ``value_expr`` must already be VARCHAR."""
    regs = sql_hll_registers(table_expr, group_col, value_expr, b)
    return sql_hll_estimate(f"({regs})", group_col, b, out_col)
