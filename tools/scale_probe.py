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


def _timed_collect(build) -> float:
    """Like :func:`_timed` but the terminal action is ``collect()``:
    ``count()`` lets Catalyst PRUNE the aggregate's value columns, and
    for probes whose kernel sits entirely inside those values (e.g.
    span_removal_apply's rebuild-text HOF behind a unique-key left
    join), the pruned plan skips the work under test — measured 0.7 s
    vs 15.8 s real at 400k docs. Only for probes whose result frame is
    small (a global aggregate row)."""
    t0 = time.perf_counter()
    build().collect()
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
        for key in [k for k in r if k.startswith("walls")]:
            suffix = key[len("walls"):]
            r[f"alpha{suffix}"] = round(
                math.log(r[key][-1] / r[key][0])
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




# --------------------------------------------------------------------------
# r11 probes: the join-shaped heavies (VERDICT r10 item 4) + the three
# r11 operators, same protocol — 3 geometric sizes, measured alpha.
# Claims under test:
# - setsim    O(candidates): PPJoin prefix filter — near-dup families of
#             fixed size keep candidates linear in docs
# - sparse_cosine  O(postings join): inverted-index dot products, never
#             all-pairs; fixed family size -> ~linear
# - dedup_funnel   chained stages (exact -> minhash -> segment): each
#             stage keyed; the chain is the sum, still ~linear
# - kcore     O(E) per peel round at fixed round count
# - lss       span postings + diagonal islands on near-dup pairs: the
#             frequency cap bounds pair fanout -> ~linear in docs
# - histstats two global_cumsum passes over the DISTINCT-value histogram:
#             sublinear in rows when the value domain saturates
# - domain_dedup   one canonical-URL window + one keyed agg -> ~linear
# --------------------------------------------------------------------------


def _neardup_docs(spark: SparkSession, n: int, words: int = 12) -> DataFrame:
    base = F.floor(F.col("id") / 2)
    toks = [
        F.concat(F.lit("w"), ((base * 20) + j).cast("string"))
        for j in range(words - 1)
    ]
    toks.append(
        F.concat(
            F.lit("w"),
            ((base * 20) + words - 1 + (F.col("id") % 2) * 7).cast("string"),
        )
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )


def probe_setsim(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.functions.text import tokenize_ws
    from ingestion_scripts_spark.operators.setjoin import setsim_join

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n).select(
            "doc_id", F.array_distinct(tokenize_ws(F.col("text"))).alias("tk")
        )
        walls.append(_timed(lambda: setsim_join(docs, "doc_id", "tk", 4, 5)))
        release_caches()
    return {"probe": "setsim", "sizes": sizes, "walls": walls}


def probe_sparse_cosine(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.dedup import shingles
    from ingestion_scripts_spark.operators.similarity import sparse_cosine_pairs

    sizes = [int(s * scale) for s in (50_000, 200_000, 800_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n).select(
            "doc_id", shingles(F.col("text"), 3).alias("sh")
        )
        walls.append(
            _timed(
                lambda: sparse_cosine_pairs(docs, "doc_id", "sh",
                                            min_cos_micro=500_000)
            )
        )
        release_caches()
    return {"probe": "sparse_cosine", "sizes": sizes, "walls": walls}


def probe_dedup_funnel(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators import dedup as D2

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n)

        def chain(docs=docs):
            surv1 = docs.groupBy(F.md5(F.col("text")).alias("__h")).agg(
                F.min("doc_id").alias("doc_id")
            )
            d1 = docs.join(surv1.select("doc_id"), "doc_id")
            pairs = D2.minhash_dedup_pairs(d1, "doc_id", "text", threshold=0.8)
            removed2 = pairs.select(F.col("id_b").alias("doc_id")).distinct()
            d2 = d1.join(removed2, "doc_id", "left_anti")
            seg = D2.segment_dedup(d2, "doc_id", "text", seg_words=8, max_docs=1)
            removed3 = seg.filter(
                2 * F.col("n_kept") < F.col("n_seg")
            ).select("doc_id")
            return d2.join(removed3, "doc_id", "left_anti").agg(
                F.count(F.lit(1)).alias("survivors")
            )

        walls.append(_timed(chain))
        release_caches()
    return {"probe": "dedup_funnel", "sizes": sizes, "walls": walls}


def probe_kcore(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.graph import kcore_peel

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        # chain edges + pseudo-random chords: a graph with a genuine 3-core
        # kernel and a large peelable fringe, degree structure fixed in n
        chain = spark.range(n // 2).select(
            F.col("id").alias("u"), (F.col("id") + 1).alias("v")
        )
        chords = spark.range(n // 2).select(
            F.col("id").alias("u"),
            ((F.col("id") * 2654435761) % F.lit(n // 2)).alias("v"),
        )
        edges = chain.union(chords).filter(F.col("u") != F.col("v"))
        walls.append(
            _timed(
                lambda: kcore_peel(edges, "u", "v", k=3, rounds=4).agg(
                    F.count(F.lit(1)).alias("n")
                )
            )
        )
        release_caches()
    return {"probe": "kcore", "sizes": sizes, "walls": walls}


def probe_lss(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.spans import (
        longest_shared_span,
        shared_span_pairs,
    )

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n, words=24)

        def run(docs=docs):
            pairs = shared_span_pairs(docs, k=8, max_docs_per_span=8)
            return longest_shared_span(docs, pairs, k=8).agg(
                F.count(F.lit(1)).alias("n"),
                F.max("lss_tokens").alias("max_lss"),
            )

        walls.append(_timed(run))
        release_caches()
    return {"probe": "lss", "sizes": sizes, "walls": walls}


def probe_histstats(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.histstats import (
        median_mad_gini_from_counts,
        value_counts,
    )

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        # 1M distinct cent values: the histogram saturates, so the stats
        # pass cost should flatten while the counting pass stays linear
        df = spark.range(n).select(
            ((F.col("id") * 2654435761) % 1_000_000).alias("v")
        )
        walls.append(
            _timed(
                lambda: median_mad_gini_from_counts(value_counts(df, "v"), "v")
            )
        )
        release_caches()
    return {"probe": "histstats", "sizes": sizes, "walls": walls}


def probe_domain_dedup(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.domains import domain_dedup_stats

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        d = F.col("id")
        url = F.concat(
            F.lit("http://www.site"),
            (d % 5000).cast("string"),
            F.when(d % 4 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
            F.lit("/p/"),
            (d % 200_000).cast("string"),
            F.lit("?id="),
            (d % 7).cast("string"),
            F.when(d % 3 == 0, F.lit("&utm_s=x")).otherwise(F.lit("")),
        )
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), url.alias("url"),
            (d % 1000).alias("sz"),
        )
        walls.append(
            _timed(
                lambda: domain_dedup_stats(docs, "url", ["sz"], ["doc_id"], "sz")
            )
        )
        release_caches()
    return {"probe": "domain_dedup", "sizes": sizes, "walls": walls}




def _snapshot_split(spark: SparkSession, n: int):
    docs = _neardup_docs(spark, n)
    base = docs.where(F.col("doc_id") % 5 != 0)
    inserts = docs.where(F.col("doc_id") % 5 == 0)
    dels = base.where(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs, base, inserts, dels


def probe_snapshot_delta(spark: SparkSession, scale: float) -> dict:
    # 4-point row with a DISCARDED warm leg (VERDICT r12 item 6: the r12
    # 3-point row's 50k point carried session JIT warmup, leaving the
    # exponent ambiguous between 0.26 and 0.67); validate=False so the
    # row prices the kernel, not the eager contract probes (the split
    # here is disjoint by predicate)
    from ingestion_scripts_spark.operators.dedup import snapshot_band_delta

    def run(n: int) -> float:
        _, base, inserts, dels = _snapshot_split(spark, n)
        w = _timed(
            lambda: snapshot_band_delta(
                base, inserts, dels, threshold=0.5, validate=False
            )
        )
        release_caches()
        return w

    run(int(10_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (50_000, 200_000, 800_000, 3_200_000)]
    walls = [run(n) for n in sizes]
    return {"probe": "snapshot_delta", "sizes": sizes, "walls": walls}


def probe_band_roll(spark: SparkSession, scale: float) -> dict:
    """The persisted-band-table path: snapshot1's band table is parquet
    on disk (written outside the timed region — a prior roll's output),
    so the timed roll never re-signs the corpus. The gap to
    probe_snapshot_delta at the same size IS the base re-signing cost
    the maintained-state contract removes."""
    import shutil
    import tempfile

    from ingestion_scripts_spark.operators.dedup import (
        banded_buckets,
        snapshot_band_roll,
    )

    def run(n: int) -> float:
        docs, base, inserts, dels = _snapshot_split(spark, n)
        d = tempfile.mkdtemp(prefix="bandroll_probe_")
        banded_buckets(base, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(f"{d}/bands")
        bb = spark.read.parquet(f"{d}/bands")
        w = _timed(
            lambda: snapshot_band_roll(
                bb, docs, inserts, dels, threshold=0.5, validate=False
            )[1]
        )
        release_caches()
        shutil.rmtree(d, ignore_errors=True)
        return w

    run(int(10_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (50_000, 200_000, 800_000, 3_200_000)]
    walls = [run(n) for n in sizes]
    return {"probe": "band_roll", "sizes": sizes, "walls": walls}


def probe_span_apply(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.spans import span_removal_apply

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n, words=24)
        walls.append(
            _timed_collect(
                lambda: span_removal_apply(docs, k=5).agg(
                    F.sum("n_removed").alias("r"),
                    F.sum(F.length("text_clean")).alias("c"),
                )
            )
        )
        release_caches()
    return {"probe": "span_apply", "sizes": sizes, "walls": walls}


def probe_cdc(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.chunking import cdc_dedup_report

    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    walls = []
    for n in sizes:
        docs = _neardup_docs(spark, n, words=24).withColumn(
            "source", (F.col("doc_id") % 8).cast("string")
        )
        walls.append(
            _timed_collect(
                lambda: cdc_dedup_report(docs).agg(
                    F.sum("dup_tokens").alias("d"),
                    F.sum("total_tokens").alias("t"),
                )
            )
        )
        release_caches()
    return {"probe": "cdc", "sizes": sizes, "walls": walls}


def probe_calib_drift(spark: SparkSession, scale: float) -> dict:
    from ingestion_scripts_spark.operators.profiling import calibration_drift

    sizes = [int(s * scale) for s in (2_000_000, 8_000_000, 32_000_000)]
    walls = []
    for n in sizes:
        d = F.col("id")
        df = spark.range(n).select(
            (d % 12).alias("b"),
            ((d * 2654435761) % 1_000_000).alias("s"),
            ((d * 40503) % 97 < 40).cast("int").alias("y"),
        )
        walls.append(
            _timed_collect(
                lambda: calibration_drift(
                    df, F.col("b"), F.col("s"), F.col("y")
                )
            )
        )
        release_caches()
    return {"probe": "calib_drift", "sizes": sizes, "walls": walls}


def probe_capped_roll(spark: SparkSession, scale: float) -> dict:
    """The stop-bucket remediation priced on its adversarial case: the
    base corpus is W boilerplate CLONES (one degenerate bucket per band),
    the delta inserts 100 more clones. The uncapped roll must enumerate
    and Jaccard-verify 100·W candidate pairs; the capped roll refuses
    the hot bucket (0 candidates) and instead pays one width aggregation
    over the band table, with the skipped pair mass accounted exactly.
    walls_uncapped should grow ~linearly in W; walls_capped should stay
    ~flat (the audit's W-linear width count is trivial next to the
    verify join it replaces)."""
    import shutil
    import tempfile

    from ingestion_scripts_spark.operators.dedup import (
        banded_buckets,
        capped_band_roll,
        snapshot_band_roll,
    )

    boiler = F.concat_ws(
        " ", *[F.lit(f"lorem{j}") for j in range(12)]
    )  # constant 12-token text -> identical shingles/bands for all docs

    def corpus(n: int):
        base = spark.range(n).select(
            F.col("id").alias("doc_id"), boiler.alias("text")
        )
        inserts = spark.range(n, n + 100).select(
            F.col("id").alias("doc_id"), boiler.alias("text")
        )
        dels = spark.createDataFrame([], "doc_id long")
        return base, inserts, dels

    def run(n: int) -> tuple[float, float]:
        base, inserts, dels = corpus(n)
        texts = base.unionByName(inserts)
        d = tempfile.mkdtemp(prefix="caproll_probe_")
        banded_buckets(base, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(f"{d}/bands")
        bb = spark.read.parquet(f"{d}/bands")
        w_uncapped = _timed(
            lambda: snapshot_band_roll(
                bb, texts, inserts, dels, threshold=0.5, validate=False
            )[1]
        )
        release_caches()
        w_capped = _timed(
            lambda: capped_band_roll(
                bb, texts, inserts, dels, threshold=0.5,
                max_bucket_width=64, validate=False,
            )[1]
        )
        release_caches()
        shutil.rmtree(d, ignore_errors=True)
        return w_uncapped, w_capped

    run(int(1_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (5_000, 20_000, 80_000, 320_000)]
    pairs = [run(n) for n in sizes]
    return {
        "probe": "capped_roll",
        "sizes": sizes,
        "walls_uncapped": [p[0] for p in pairs],
        "walls_capped": [p[1] for p in pairs],
    }


def probe_chunk_roll(spark: SparkSession, scale: float) -> dict:
    """The maintained chunk store priced against from-scratch rebuild at
    the same snapshot roll (the CDC analog of probe_band_roll): store1 is
    parquet on disk (a prior roll's output, written outside the timed
    region); the timed roll chunks ONLY the delta (~31% of the corpus
    under the %5/%7 split) and maintains refcounts by one hash-keyed
    full-outer join, while the from-scratch side re-chunks snapshot2
    whole. The gap is the corpus re-chunking cost the maintained state
    removes — at a production delta fraction (<1%) the gap widens
    accordingly."""
    import shutil
    import tempfile

    from ingestion_scripts_spark.operators.chunking import (
        build_chunk_store,
        chunk_store_roll,
    )

    def run(n: int) -> tuple[float, float]:
        docs = _neardup_docs(spark, n, words=24)
        base = docs.where(F.col("doc_id") % 5 != 0)
        inserts = docs.where(F.col("doc_id") % 5 == 0)
        dels = base.where(F.col("doc_id") % 7 == 0).select("doc_id")
        snap2 = base.join(dels, "doc_id", "left_anti").unionByName(inserts)
        d = tempfile.mkdtemp(prefix="chunkroll_probe_")
        build_chunk_store(base).write.mode("overwrite").parquet(f"{d}/store")
        store1 = spark.read.parquet(f"{d}/store")
        w_roll = _timed(
            lambda: chunk_store_roll(
                store1, base, inserts, dels, validate=False
            )[0]
        )
        release_caches()
        w_scratch = _timed(lambda: build_chunk_store(snap2))
        release_caches()
        shutil.rmtree(d, ignore_errors=True)
        return w_roll, w_scratch

    run(int(10_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (50_000, 200_000, 800_000)]
    pairs = [run(n) for n in sizes]
    return {
        "probe": "chunk_roll",
        "sizes": sizes,
        "walls_roll": [p[0] for p in pairs],
        "walls_scratch": [p[1] for p in pairs],
    }


def probe_cdc_clamped(spark: SparkSession, scale: float) -> dict:
    """Clamp overhead: the sequential per-doc aggregate walk vs the
    position-parallel basic scheme on the same corpus — the price of
    production boundary discipline. Expect a modest constant factor
    (same candidate HOF; the walk adds one pass over ~n/16 candidates
    per doc), both ~linear."""
    from ingestion_scripts_spark.operators.chunking import (
        cdc_chunks,
        cdc_chunks_clamped,
    )

    def run(n: int) -> tuple[float, float]:
        docs = _neardup_docs(spark, n, words=24)
        w_basic = _timed(lambda: cdc_chunks(docs))
        release_caches()
        w_clamped = _timed(
            lambda: cdc_chunks_clamped(docs, min_len=8, max_len=24)
        )
        release_caches()
        return w_basic, w_clamped

    run(int(10_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000)]
    pairs = [run(n) for n in sizes]
    return {
        "probe": "cdc_clamped",
        "sizes": sizes,
        "walls_basic": [p[0] for p in pairs],
        "walls_clamped": [p[1] for p in pairs],
    }


def probe_sweep(spark: SparkSession, scale: float) -> dict:
    """The offline hot-bucket sweep priced against the all-pairs pass it
    bounds: W boilerplate clones collapse into one degenerate bucket per
    band; enumerating + verifying every in-bucket pair
    (pairs_from_banded) is O(W^2), while hot_bucket_sweep at a fixed
    rank window pays O(W*window). walls_allpairs should show alpha~2,
    walls_sweep ~linear — the measured form of the sweep's candidate
    bound."""
    from ingestion_scripts_spark.operators.dedup import (
        banded_buckets,
        hot_bucket_sweep,
        jaccard,
        pairs_from_banded,
        shingles,
    )

    boiler = F.concat_ws(" ", *[F.lit(f"lorem{j}") for j in range(12)])

    def corpus(n: int):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), boiler.alias("text")
        )

    def run(n: int) -> tuple[float, float]:
        docs = corpus(n)
        bands = banded_buckets(docs, "doc_id", "text")

        def allpairs():
            cand = pairs_from_banded(bands, "doc_id").select(
                F.col("id_a").alias("id1"), F.col("id_b").alias("id2")
            )
            sh = docs.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
            return (
                cand.join(
                    sh.select(F.col("doc_id").alias("id1"),
                              F.col("sh").alias("s1")), "id1",
                )
                .join(
                    sh.select(F.col("doc_id").alias("id2"),
                              F.col("sh").alias("s2")), "id2",
                )
                .filter(F.round(jaccard(F.col("s1"), F.col("s2")), 6) >= 0.5)
            )

        w_all = _timed(allpairs)
        release_caches()
        w_sweep = _timed(
            lambda: hot_bucket_sweep(
                bands, docs, threshold=0.5, max_bucket_width=64,
                neighbor_window=8,
            )
        )
        release_caches()
        return w_all, w_sweep

    run(int(200 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (500, 1_000, 2_000, 4_000)]
    pairs = [run(n) for n in sizes]
    return {
        "probe": "sweep",
        "sizes": sizes,
        "walls_allpairs": [p[0] for p in pairs],
        "walls_sweep": [p[1] for p in pairs],
    }


def probe_ivf_roll(spark: SparkSession, scale: float) -> dict:
    """The maintained IVF postings table priced against from-scratch
    re-assignment at the same snapshot roll: postings1 is parquet on
    disk (a prior roll's output, written outside the timed region); the
    timed roll assigns cells for a FIXED 2k-insert/1k-delete delta and
    maintains the table by one anti-join + union, while the from-scratch
    side re-runs the coarse quantizer (8 cells x 64-dim folds) over all
    W corpus vectors. walls_scratch grows ~linearly in W; walls_roll's
    only W-term is the pruned postings scan."""
    import shutil
    import tempfile

    from ingestion_scripts_spark.operators import similarity as SIM

    def vecs(ids):
        return ids.select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.pmod(F.hash(F.col("id") * 64 + d), F.lit(2001))
                    - F.lit(1000)
                ).cast("double") / F.lit(1000.0),
            ).alias("embedding"),
        )

    def run(n: int) -> tuple[float, float]:
        base = vecs(spark.range(n))
        inserts = vecs(spark.range(n, n + 2_000))
        dels = spark.range(1_000).select(F.col("id").alias("vec_id"))
        d = tempfile.mkdtemp(prefix="ivfroll_probe_")
        empty = spark.createDataFrame([], "vec_id long, cell int")
        nodel = spark.createDataFrame([], "vec_id long")
        SIM.ivf_postings_roll(empty, base, nodel, validate=False)[
            0
        ].write.mode("overwrite").parquet(f"{d}/post_v1")
        p1 = spark.read.parquet(f"{d}/post_v1")
        snap2 = base.join(dels, "vec_id", "left_anti").unionByName(inserts)

        def cells(post):
            # terminal per-cell count: count() alone would let Catalyst
            # PRUNE the cell column and skip the quantizer under test
            # (the _timed_collect lesson, span_removal_apply probe)
            return post.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))

        w_scratch = _timed_collect(
            lambda: cells(
                SIM.ivf_postings_roll(empty, snap2, nodel, validate=False)[0]
            )
        )
        release_caches()
        w_roll = _timed_collect(
            lambda: cells(
                SIM.ivf_postings_roll(p1, inserts, dels, validate=False)[0]
            )
        )
        release_caches()
        shutil.rmtree(d, ignore_errors=True)
        return w_scratch, w_roll

    run(int(10_000 * scale))  # warm leg, discarded
    sizes = [int(s * scale) for s in (100_000, 400_000, 1_600_000, 6_400_000)]
    pairs = [run(n) for n in sizes]
    return {
        "probe": "ivf_roll",
        "sizes": sizes,
        "walls_scratch": [p[0] for p in pairs],
        "walls_roll": [p[1] for p in pairs],
    }


def probe_sweep_cache(spark: SparkSession, scale: float) -> dict:
    """Boundedness of the r14 hot_bucket_sweep candidate persist (VERDICT
    r14 item 8): the cached frame is claimed Σ_hot w·window-bounded BY
    CONSTRUCTION — this probe measures the claim on the adversarial
    corpus (W boilerplate clones = one degenerate bucket per band).
    ``cands`` should grow ~linearly in W (alpha ≈ 1: rank-window
    neighbors only) while the uncapped pair mass of the same buckets is
    W(W-1)/2 per band (alpha = 2) — i.e. the cache grows with the
    delta/window term, never the quadratic bucket mass, so persisting it
    is safe at any corpus scale."""
    from ingestion_scripts_spark.operators.dedup import (
        banded_buckets,
        hot_bucket_sweep_candidates,
    )

    boiler = F.concat_ws(" ", *[F.lit(f"lorem{j}") for j in range(12)])
    sizes = [int(s * scale) for s in (1_000, 4_000, 16_000)]
    walls, cands, pair_mass = [], [], []
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"), boiler.alias("text")
        )
        bands = banded_buckets(docs, "doc_id", "text")
        t0 = time.time()
        c = hot_bucket_sweep_candidates(
            bands, docs, max_bucket_width=64, neighbor_window=8
        ).count()
        walls.append(round(time.time() - t0, 2))
        cands.append(c)
        pair_mass.append(4 * n * (n - 1) // 2)  # 4 bands x all-pairs
        release_caches()
    return {
        "probe": "sweep_cache",
        "sizes": sizes,
        "walls": walls,
        "cands": cands,
        "uncapped_pair_mass": pair_mass,
        "alpha_cands": round(
            math.log(cands[-1] / cands[0]) / math.log(sizes[-1] / sizes[0]), 3
        ),
    }


PROBES.update(
    {
        "sweep_cache": probe_sweep_cache,
        "setsim": probe_setsim,
        "sparse_cosine": probe_sparse_cosine,
        "dedup_funnel": probe_dedup_funnel,
        "kcore": probe_kcore,
        "lss": probe_lss,
        "histstats": probe_histstats,
        "domain_dedup": probe_domain_dedup,
        "snapshot_delta": probe_snapshot_delta,
        "band_roll": probe_band_roll,
        "span_apply": probe_span_apply,
        "calib_drift": probe_calib_drift,
        "cdc": probe_cdc,
        "capped_roll": probe_capped_roll,
        "chunk_roll": probe_chunk_roll,
        "cdc_clamped": probe_cdc_clamped,
        "sweep": probe_sweep,
        "ivf_roll": probe_ivf_roll,
    }
)


if __name__ == "__main__":
    main()
