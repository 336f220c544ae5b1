"""Probabilistic record linkage — Fellegi-Sunter match scoring over
blocked candidate pairs (Fellegi & Sunter, JASA 1969; the scoring layer
the reference's dedup-by-key sink cannot express, and the standard next
step after blocking in any large-scale entity-resolution pipeline).

Pipeline shape (all keyed, nothing quadratic):

1. candidates — sorted-neighborhood within blocks: rank records per block
   by a sort key, pair each record with its next ``window`` neighbors.
   Candidate volume is exactly ``n * window`` regardless of block-size
   skew (same guarantee as ``editdist.snm_candidate_pairs``).
2. u-probabilities ESTIMATED FROM DATA: for field j,
   u_j = P(agree_j | random pair) = Σ_v n_v(n_v-1) / (N(N-1)) — an exact
   integer ratio from one groupBy per field, broadcast into the scoring
   join as a 1-row aggregate. m-probabilities are caller-supplied priors
   (the classical choice when no labeled matches exist; EM refinement
   would slot in here).
3. score — per pair, Σ_j [agree_j · log2(m_j/u_j) +
   (1-agree_j) · log2((1-m_j)/(1-u_j))], rounded to 1e-4 before any
   ordering so ranking is stable cross-engine.

At 100 TB: blocks shuffle once on the block key for the neighbor window,
the u-aggregates are O(fields) rows broadcast everywhere, and the score
is a row-local expression — no shuffle grows with pair count beyond the
linear candidate set itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    order_cols: list[str],
    window: int = 3,
) -> DataFrame:
    """(id_a, id_b) candidate pairs: each record paired with its next
    ``window`` neighbors in ``order_cols`` order within its block.
    Exactly one window shuffle on the block key; output is linear in n."""
    w = Window.partitionBy(block_col).orderBy(
        *[F.col(c) for c in order_cols], F.col(id_col)
    )
    r = df.withColumn("__rn", F.row_number().over(w))
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("b.__rn") - F.col("a.__rn")).isin(
                *range(1, window + 1)
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[
                F.col(f"a.{c}").alias(f"{c}_a")
                for c in df.columns
                if c not in (id_col,)
            ],
            *[
                F.col(f"b.{c}").alias(f"{c}_b")
                for c in df.columns
                if c not in (id_col,)
            ],
        )
    )


def u_probability(df: DataFrame, field: str, alias: str) -> DataFrame:
    """1-row (``alias``,) DataFrame: the probability two RANDOM records
    agree on ``field`` — Σ_v n_v(n_v-1) / (N(N-1)), computed as an exact
    integer ratio then one double division. Broadcast-joined by callers."""
    per_value = df.groupBy(field).agg(F.count(F.lit(1)).alias("nv"))
    return per_value.agg(
        (
            F.sum(F.col("nv") * (F.col("nv") - 1))
            / (F.sum("nv") * (F.sum("nv") - F.lit(1)))
        ).alias(alias)
    )


def fs_field_weight(agree: Column, m: float, u: Column) -> Column:
    """Fellegi-Sunter log2 weight for one comparison field: the
    agreement weight log2(m/u) when the field agrees, the disagreement
    weight log2((1-m)/(1-u)) when it does not."""
    ln2 = 0.6931471805599453
    return F.when(
        agree, (F.log(F.lit(m) / u)) / F.lit(ln2)
    ).otherwise((F.log(F.lit(1.0 - m) / (F.lit(1.0) - u))) / F.lit(ln2))
