"""Empirical scale probes for the registry's five heaviest kernels
(VERDICT r9 item 5): synthetic 1M-50M-row inputs generated
DISTRIBUTEDLY (spark.range + column expressions, no driver-side data),
each kernel timed at 3 geometric sizes so the growth exponent
alpha = log(w_max/w_min) / log(n_max/n_min) is measured, not claimed.

Claims under test (SCALING.md / VERDICT r9 plan audit):
- cc_star        O(E log D): alternating large/small-star rounds on a
                 chain-heavy graph — wall ~linear in edges at fixed
                 component diameter
- minhash_pairs  O(N): banded LSH equi-join, never all-pairs — wall
                 ~linear in docs
- segment_dedup  O(N): 8-word segment hash aggregate — ~linear in docs
- ann_exhaustive O(N) for a FIXED query panel: broadcast(queries) x
                 corpus scan — ~linear in corpus (the quadratic recall
                 harness at sf0.1 is the QA configuration, not the
                 production shape)
- coorder_edges  O(N) at fixed basket size: per-order pair inflation is
                 basket^2 = constant; the hub cap is the basket bound

Usage: python tools/scale_probe.py [probe ...] [--scale F]
Prints one JSON line per probe: {"probe", "sizes", "walls", "alpha"}.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ingestion_scripts_spark.caching import release_caches
from ingestion_scripts_spark.session import build_session


def _timed(build) -> float:
    """Time thunk() -> DataFrame INCLUDING build: iterative kernels
    (cc_star's star rounds, kmeans/bpe loops) fire Spark jobs at build
    time, so timing only the terminal action would miss the work."""
    t0 = time.perf_counter()
    build().count()
    return round(time.perf_counter() - t0, 2)


def probe_cc_star(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.dedup import connected_components_star

    sizes = [int(s * scale) for s in (1_000_000, 4_000_000, 16_000_000)]
    walls = []
    for n in sizes:
        # chains of length 1000: diameter (and so round count) fixed,
        # edges grow — isolates the per-round O(E) term
        edges = (
            spark.range(n)
            .where(F.col("id") % 1000 != 999)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        walls.append(
            _timed(
                lambda: connected_components_star(edges).agg(
                    F.countDistinct("comp").alias("nc")
                )
            )
        )
        release_caches()
    return {"probe": "cc_star", "sizes": sizes, "walls": walls}


def probe_minhash_pairs(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.dedup import minhash_dedup_pairs

    sizes = [int(s * scale) for s in (50_000, 200_000, 800_000)]
    walls = []
    for n in sizes:
        # docs 2i / 2i+1 share 11 of 12 tokens -> realistic near-dup load
        base = F.floor(F.col("id") / 2)
        toks = [
            F.concat(F.lit("w"), ((base * 20) + j).cast("string"))
            for j in range(11)
        ]
        toks.append(
            F.concat(
                F.lit("w"), ((base * 20) + 11 + (F.col("id") % 2) * 7).cast("string")
            )
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
        )
        walls.append(
            _timed(lambda: minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8))
        )
        release_caches()
    return {"probe": "minhash_pairs", "sizes": sizes, "walls": walls}


def probe_segment_dedup(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.dedup import segment_dedup

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        base = F.floor(F.col("id") / 4)  # 4-doc families share segments
        toks = [
            F.concat(F.lit("s"), ((base * 24) + j).cast("string"))
            for j in range(16)
        ]
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
        )
        walls.append(
            _timed(lambda: segment_dedup(docs, "doc_id", "text", seg_words=8, max_docs=1))
        )
        release_caches()
    return {"probe": "segment_dedup", "sizes": sizes, "walls": walls}


def probe_ann_exhaustive(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.similarity import cosine_topk

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda j: ((F.col("id") * (j + 1) + j * j) % 997).cast("double") + 1.0,
        )
        corpus = spark.range(n).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        )
        queries = corpus.where(F.col("vec_id") < 64)  # FIXED panel
        walls.append(_timed(lambda: cosine_topk(queries, corpus, k=10)))
        release_caches()
    return {"probe": "ann_exhaustive", "sizes": sizes, "walls": walls}


def probe_coorder_edges(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.graph import modularity

    sizes = [int(s * scale) for s in (1_000_000, 4_000_000, 16_000_000)]
    walls = []
    for n in sizes:
        # baskets of 4 items from a pool of n//100 — fixed basket size,
        # so per-order pair inflation is C(4,2)=6, constant in corpus
        b = spark.range(n).select(
            F.floor(F.col("id") / 4).alias("bk"),
            ((F.col("id") * 2654435761) % F.lit(max(n // 100, 1000))).alias("it"),
        )
        x, y = b.alias("x"), b.alias("y")
        e = (
            x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
            .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
            .agg(F.count(F.lit(1)).alias("w"))
        )
        labels = e.select(F.col("a").alias("node")).distinct().select(
            "node", (F.col("node") % 32).alias("label")
        )
        walls.append(_timed(lambda: modularity(e.select("a", "b"), labels)))
        release_caches()
    return {"probe": "coorder_edges", "sizes": sizes, "walls": walls}


PROBES = {
    "cc_star": probe_cc_star,
    "minhash_pairs": probe_minhash_pairs,
    "segment_dedup": probe_segment_dedup,
    "ann_exhaustive": probe_ann_exhaustive,
    "coorder_edges": probe_coorder_edges,
}


def main() -> None:
    args = sys.argv[1:]
    scale = 1.0
    if "--scale" in args:
        i = args.index("--scale")
        scale = float(args[i + 1])
        del args[i : i + 2]
    names = args or list(PROBES)
    spark = build_session(
        app_name="scale-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        r = PROBES[name](spark, scale)
        r["alpha"] = round(
            math.log(r["walls"][-1] / r["walls"][0])
            / math.log(r["sizes"][-1] / r["sizes"][0]),
            3,
        )
        print(json.dumps(r), flush=True)




def probe_gini_rank(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.ranking import gini_coefficient

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % 1_000_000).alias("v"),
            F.col("id").alias("pid"),
        )
        walls.append(_timed(lambda: gini_coefficient(df, "v", ["pid"])))
        release_caches()
    return {"probe": "gini_rank", "sizes": sizes, "walls": walls}


def probe_median_mad(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.ranking import global_median_mad

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % 1_000_000).alias("v"),
            F.col("id").alias("pid"),
        )
        walls.append(_timed(lambda: global_median_mad(df, "v", ["pid"])))
        release_caches()
    return {"probe": "median_mad", "sizes": sizes, "walls": walls}


def probe_bootstrap(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.bootstrap import poisson_bootstrap_ci

    sizes = [int(s * scale) for s in (250_000, 1_000_000, 4_000_000)]
    walls = []
    for n in sizes:
        df = spark.range(n).select(
            F.col("id"), ((F.col("id") * 48271) % 100_000).alias("v")
        )
        walls.append(
            _timed(lambda: poisson_bootstrap_ci(df, "v", "id", b_replicates=32))
        )
        release_caches()
    return {"probe": "bootstrap", "sizes": sizes, "walls": walls}


def probe_interleave(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.ranking import interleave_audit

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % 20).cast("string").alias("src"),
            F.col("id").alias("pos"),
        )
        walls.append(
            _timed(lambda: interleave_audit(df, "src", [F.asc("pos")]))
        )
        release_caches()
    return {"probe": "interleave", "sizes": sizes, "walls": walls}


PROBES.update(
    {
        "gini_rank": probe_gini_rank,
        "median_mad": probe_median_mad,
        "bootstrap": probe_bootstrap,
        "interleave": probe_interleave,
    }
)


if __name__ == "__main__":
    main()
