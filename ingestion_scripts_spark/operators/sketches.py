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


def cms_sketch(
    df: DataFrame, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Count-min sketch of a key column: (``__row``, ``__col``, ``__n``).

    Each record increments one cell per hash row (d salted md5-derived
    hashes → column index). Built as an explode(d) + groupBy count — the
    sketch is d·w cells TOTAL regardless of corpus size, and map-side
    partial aggregation means each task emits at most d·w rows. Mergeable:
    sketches of two corpora add cell-wise (same reason HLL registers max).

    At 100 TB this is the heavy-hitters primitive: exact per-key counts
    shuffle every key; the sketch shuffles ≤ d·w rows per task and the
    point-estimate pass only touches candidate keys.
    """
    rows = F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("__row")
    keyed = df.select(F.col(value_col).cast("string").alias("__k"), rows)
    col = hash64(F.concat_ws(":", F.col("__row"), F.col("__k"))) % w
    return (
        keyed.select("__row", col.alias("__col"))
        .groupBy("__row", "__col")
        .count()
        .withColumnRenamed("count", "__n")
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 256,
    out_col: str = "est",
) -> DataFrame:
    """Point-estimate counts for ``keys`` from a CMS: min over the d cells
    each key hashes to. The join is (d rows per key) ⋈ (d·w-cell sketch) —
    the sketch side is tiny and broadcasts, so no shuffle of the key set."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("__row"),
    ).withColumn(
        "__col", hash64(F.concat_ws(":", F.col("__row"), F.col(key_col).cast("string"))) % w
    )
    return (
        probes.join(F.broadcast(sketch), ["__row", "__col"])
        .groupBy(key_col)
        .agg(F.min("__n").cast("bigint").alias(out_col))
    )


def sql_cms_estimate(
    table_expr: str, key_expr: str, d: int = 4, w: int = 256, out_col: str = "est"
) -> str:
    """DuckDB twin of ``cms_sketch`` + ``cms_estimate`` over every distinct
    key of the same relation (same salted hashes, same cells)."""
    from ..oracle import sql_hash64

    h = sql_hash64("(r.i || ':' || k.__k)")
    return f"""
WITH keyed AS (SELECT {key_expr} AS __k FROM {table_expr}),
cells AS (
  SELECT r.i AS row_i, {h} % {w} AS col_i, count(*) AS n
  FROM keyed k, (SELECT unnest(range({d})) AS i) r
  GROUP BY 1, 2),
probes AS (
  SELECT k.__k, r.i AS row_i, {h} % {w} AS col_i
  FROM (SELECT DISTINCT __k FROM keyed) k, (SELECT unnest(range({d})) AS i) r)
SELECT p.__k, CAST(min(c.n) AS BIGINT) AS {out_col}
FROM probes p JOIN cells c ON p.row_i = c.row_i AND p.col_i = c.col_i
GROUP BY 1"""


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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch
# ---------------------------------------------------------------------------

#: hash64 is 15 hex digits of md5 = 60 uniform bits in [0, 2^60)
KMV_SPACE = 1 << 60


def kmv_sketch(df: DataFrame, group_col: str, value, k: int = 64) -> DataFrame:
    """Per-group KMV (k-minimum-values, a.k.a. bottom-k / theta) sketch:
    the k smallest distinct md5-derived hashes of ``value`` — the
    order-statistics alternative to HLL (Bar-Yossef et al. 2002; the
    DataSketches theta family). Same mergeability story as
    ``hll_registers``: the sketch of a UNION of groups is the k smallest
    of the union of the groups' sketches, so rollups never rescan data —
    and unlike HLL, KMV supports set intersection estimates directly.

    Returns (g, h) rows — at most k per group, exact integers.
    """
    hashed = df.select(
        F.col(group_col).alias("g"), hash64(value).alias("h")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
    )


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: if the group holds fewer
    than k hashes the count is EXACT (= m); otherwise est =
    floor((k-1) * 2^60 / h_k) where h_k is the k-th smallest hash — the
    standard unbiased KMV estimator. The single float multiply+divide is
    over exactly-representable operands ((k-1)*2^60 has a <=7-bit
    mantissa) and both engines round the BIGINT h_k to double identically
    (IEEE nearest), so the floor is cross-engine exact.
    """
    agg = sketch.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("h").cast("bigint").alias("kth"),
    )
    return agg.select(
        "g",
        "m",
        F.when(F.col("m") < k, F.col("m"))
        .otherwise(
            F.floor(
                F.lit(float((k - 1) * KMV_SPACE))
                / F.col("kth").cast("double")
            ).cast("bigint")
        )
        .alias("est"),
        F.when(F.col("m") < k, F.lit(None).cast("bigint"))
        .otherwise(F.col("kth"))
        .alias("kth_hash"),
    )


def sql_kmv_sketch(
    table_expr: str, group_col: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB twin of ``kmv_sketch`` (same md5 hash, same bottom-k)."""
    from ..oracle import sql_hash64

    h = sql_hash64(value_expr)
    return f"""
SELECT g, h FROM (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
  FROM (SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table_expr}))
WHERE rn <= {k}"""


def sql_kmv_estimate(sketch_expr: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_estimate`` over a (g, h) sketch relation."""
    lit = repr(float((k - 1) * KMV_SPACE))
    return f"""
SELECT g, m,
       CASE WHEN m < {k} THEN m
            ELSE CAST(floor({lit} / CAST(kth AS DOUBLE)) AS BIGINT) END
         AS est,
       CASE WHEN m < {k} THEN NULL ELSE kth END AS kth_hash
FROM (SELECT g, CAST(count(*) AS BIGINT) AS m, CAST(max(h) AS BIGINT) AS kth
      FROM {sketch_expr} GROUP BY g)"""


def kmv_intersect(sk_a: DataFrame, sk_b: DataFrame, k: int = 64) -> DataFrame:
    """Jaccard / intersection estimation from two KMV sketches — the theta
    trick HLL cannot do (HLL unions are exact but intersections need
    inclusion-exclusion, whose error explodes for small overlaps): take
    the bottom-k of the sketch UNION; the fraction of those hashes
    present in BOTH input sketches is an unbiased Jaccard estimate, and
    intersection = jaccard x union-size estimate.

    Exactness: membership counts are exact joins over exact hashes;
    jaccard_micro = (matches * 1e6) div m_union is a truncating integer
    division; when the union holds fewer than k distinct hashes
    EVERYTHING is exact (the sketches are the full hash sets). Returns
    one row (m_union, matches, jaccard_micro, union_est, inter_est).
    """
    from pyspark.sql import Window

    a = sk_a.select("h").distinct()
    b = sk_b.select("h").distinct()
    u = a.unionByName(b).distinct()
    w = Window.orderBy("h")
    uk = (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("h")
    )
    flagged = uk.join(
        a.select("h", F.lit(1).alias("ina")), "h", "left"
    ).join(b.select("h", F.lit(1).alias("inb")), "h", "left")
    agg = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("m_union"),
        F.sum(((F.col("ina") == 1) & (F.col("inb") == 1)).cast("int"))
        .cast("bigint")
        .alias("matches"),
        F.max("h").cast("bigint").alias("kth"),
    )
    union_est = F.when(F.col("m_union") < k, F.col("m_union")).otherwise(
        F.floor(
            F.lit(float((k - 1) * KMV_SPACE)) / F.col("kth").cast("double")
        ).cast("bigint")
    )
    # inter_est via INTEGER division on both engines: a double->bigint
    # cast truncates on Spark but rounds on DuckDB (the
    # recursive_front_door portability gotcha)
    return agg.select(
        "m_union",
        "matches",
        F.expr("(matches * 1000000) div m_union").cast("bigint").alias(
            "jaccard_micro"
        ),
        union_est.alias("union_est"),
    ).select(
        "m_union",
        "matches",
        "jaccard_micro",
        "union_est",
        F.expr("(matches * union_est) div m_union").cast("bigint").alias(
            "inter_est"
        ),
    )


def sql_kmv_intersect(sk_a_expr: str, sk_b_expr: str, k: int = 64) -> str:
    """DuckDB twin of ``kmv_intersect`` over two (g, h) sketch relations."""
    lit = repr(float((k - 1) * KMV_SPACE))
    return f"""
WITH a AS (SELECT DISTINCT h FROM {sk_a_expr}),
b AS (SELECT DISTINCT h FROM {sk_b_expr}),
u AS (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)),
uk AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM u) WHERE rn <= {k}),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m_union,
         CAST(sum(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS matches,
         CAST(max(uk.h) AS BIGINT) AS kth
  FROM uk LEFT JOIN a ON a.h = uk.h LEFT JOIN b ON b.h = uk.h)
SELECT m_union, matches,
       CAST((matches * 1000000) // m_union AS BIGINT) AS jaccard_micro,
       CASE WHEN m_union < {k} THEN m_union
            ELSE CAST(floor({lit} / CAST(kth AS DOUBLE)) AS BIGINT) END
         AS union_est,
       CAST((matches * (CASE WHEN m_union < {k} THEN m_union
            ELSE CAST(floor({lit} / CAST(kth AS DOUBLE)) AS BIGINT) END))
            // m_union AS BIGINT) AS inter_est
FROM agg"""
