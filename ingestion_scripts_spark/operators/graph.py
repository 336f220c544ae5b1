"""Iterative graph operators: weighted PageRank in exact integer units.

PageRank over a transition graph is the standard importance prior for
crawl scheduling and source weighting in web-scale corpus curation
(the original use case). The iterative structure is the interesting
part for a Spark engine: a fixed number of join+aggregate rounds, each
keyed by node — no driver-side state beyond the loop counter, so a
billion-node graph runs as `iters` ordinary shuffles.

Cross-engine determinism: ranks live in integer micro-units
(1.0 → 1_000_000). Every per-edge contribution is an exact integer
floor-division `(r_u * w) div out_total`, and the damping update is
`150_000 + (85 * Σc) div 100` — all BIGINT, so results are independent
of aggregation-tree shape and bit-identical across engines. (Dangling
nodes — no out-edges — simply leak their mass, the usual simplification
when ranks are used as relative ordering weights.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1.0 in micro-units
_ONE = 1_000_000
#: damping 0.85 as an exact integer rational
_DAMP_NUM, _DAMP_DEN = 85, 100
#: (1 - 0.85) * 1e6
_BASE = 150_000


def pagerank_int(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank, ``iters`` exact-integer rounds.

    ``edges``: (src, dst, w>0). Returns (node, pr_u, pr) where ``pr_u``
    is the BIGINT micro-unit rank and ``pr`` its float rendering.

    Each round: c(u→v) = (r_u · w_uv) div out_u ; r'(v) = 150000 +
    (85 · Σ_u c) div 100. Ranks start at 1.0 (unnormalized PageRank —
    no global N in the law, so the update is purely edge-local)."""
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("bigint").alias("w"),
        )
        .join(
            edges.groupBy(F.col(src_col).alias("src")).agg(
                F.sum(F.col(weight_col).cast("bigint")).alias("wt")
            ),
            "src",
        )
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(_ONE).cast("bigint").alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(r * w) div wt").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"CAST({_BASE} + ({_DAMP_NUM} * coalesce(c, 0L)) div {_DAMP_DEN} "
                "AS BIGINT)"
            ).alias("r"),
        )
    return ranks.select(
        "node",
        F.col("r").alias("pr_u"),
        (F.col("r") / F.lit(float(_ONE))).alias("pr"),
    )
