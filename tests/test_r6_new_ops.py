"""Law/property tests for the r6 batch-2 operators: k-core peeling
(`operators/graph.py::kcore_peel`), greedy k-center coreset selection
(`operators/clustering.py::kcenter_greedy`), per-group average precision
(`operators/profiling.py::average_precision`), and SQ8 scalar-quantization
recall (`operators/similarity.py::sq8_quantize_recall`). Style model:
tests/test_cc_star.py — pin the LAW (peel fixpoint, greedy selection
order, exact AP arithmetic, order-preserving quantization) against
independently hand-derived expectations, not golden snapshots."""

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.clustering import kcenter_greedy
from ingestion_scripts_spark.operators.graph import kcore_peel
from ingestion_scripts_spark.operators.profiling import average_precision
from ingestion_scripts_spark.operators.similarity import (
    sq8_codebook,
    sq8_quantize_recall,
)


# --------------------------------------------------------------------------
# k-core
# --------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_kcore_keeps_clique_peels_tail(spark):
    # 4-clique {1,2,3,4} with a pendant path 4-5-6: the 3-core is exactly
    # the clique (every clique node has in-core degree 3); 5 and 6 peel.
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    e = _edges(spark, clique + [(4, 5), (5, 6)])
    out = kcore_peel(e, "a", "b", k=3, rounds=4).collect()
    assert {r["node"] for r in out} == {1, 2, 3, 4}
    assert all(r["core_deg"] == 3 for r in out)


def test_kcore_fixpoint_extra_rounds_are_noops(spark):
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    e = _edges(spark, clique + [(4, 5), (5, 6)])
    a = sorted(map(tuple, kcore_peel(e, "a", "b", k=3, rounds=3).collect()))
    b = sorted(map(tuple, kcore_peel(e, "a", "b", k=3, rounds=6).collect()))
    assert a == b


def test_kcore_chain_peels_to_empty_one_end_per_round(spark):
    # path 1-2-3-4-5 has no 2-core, but peeling needs MULTIPLE rounds
    # (only the endpoints drop each round) — pins that the unroll really
    # iterates rather than filtering on initial degree once.
    path = [(i, i + 1) for i in range(1, 5)]
    e = _edges(spark, path)
    assert kcore_peel(e, "a", "b", k=2, rounds=1).count() == 3  # 2,3,4 left
    assert kcore_peel(e, "a", "b", k=2, rounds=3).count() == 0
    # a cycle IS its own 2-core: nothing ever peels
    cycle = path + [(5, 1)]
    out = kcore_peel(_edges(spark, cycle), "a", "b", k=2, rounds=3).collect()
    assert {r["node"] for r in out} == {1, 2, 3, 4, 5}


# --------------------------------------------------------------------------
# greedy k-center
# --------------------------------------------------------------------------

def test_kcenter_selection_order_and_radii_exact(spark):
    # 1-D corpus: id1 at 0.0 (seed: min id), id2 at 0.1, id3 at 1.0,
    # id4 at 0.5. Greedy: pick id3 (farthest from seed, 1e6^2), then id4
    # (min-dist 0.5^2 to either end), then id2 (0.1^2 to seed).
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [0.1]), (3, [1.0]), (4, [0.5])],
        "vec_id bigint, embedding array<double>",
    )
    out = kcenter_greedy(df, "embedding", "vec_id", k=4).orderBy("rank").collect()
    assert [(r["rank"], r["center_id"], r["picked_dist_sq"]) for r in out] == [
        (1, 1, 0),
        (2, 3, 1_000_000_000_000),
        (3, 4, 250_000_000_000),
        (4, 2, 10_000_000_000),
    ]


def test_kcenter_radii_nonincreasing_on_real_vectors(spark):
    from ingestion_scripts_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = kcenter_greedy(emb, "embedding", "vec_id", k=5).orderBy("rank").collect()
    radii = [r["picked_dist_sq"] for r in out[1:]]  # seed's 0 excluded
    assert radii == sorted(radii, reverse=True)
    assert len({r["center_id"] for r in out}) == 5  # never re-picks


def test_kcenter_k40_constant_codegen_matches_python(spark):
    """r6 VERDICT item 4 gate: the running-dmin form must hold at k far
    beyond coreset sizes — the retired form embedded ALL picked centers as
    an O(k)-deep least-chain of literal arrays (a codegen bomb at k=40+).
    Pinned against an independent pure-Python greedy on a 60-point corpus;
    wrong-dmin-carry bugs (stale dmin, missing least-fold) cannot match 40
    exact picks+radii in a row."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1)])
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    # independent reference: same micro-unit quantization, plain greedy
    import math

    q = {i: [math.floor(x * 1e6 + 0.5) for x in v] for i, v in rows}
    picked = [min(q)]
    dmin = {
        i: sum((a - b) * (a - b) for a, b in zip(v, q[picked[0]]))
        for i, v in q.items()
    }
    expect = [(1, picked[0], 0)]
    for rank in range(2, 41):
        far = max(dmin, key=lambda i: (dmin[i], -i))
        expect.append((rank, far, dmin[far]))
        newest = q[far]
        for i, v in q.items():
            d = sum((a - b) * (a - b) for a, b in zip(v, newest))
            if d < dmin[i]:
                dmin[i] = d

    out = kcenter_greedy(df, "embedding", "vec_id", k=40).orderBy("rank").collect()
    got = [(r["rank"], r["center_id"], r["picked_dist_sq"]) for r in out]
    assert got == expect


# --------------------------------------------------------------------------
# average precision
# --------------------------------------------------------------------------

def test_average_precision_exact_micro_arithmetic(spark):
    # ranked by score desc: labels (1, 0, 1) -> terms 1e6 and (2e6 div 3),
    # AP = floor((1000000 + 666666) / 2 + 0.5) / 1e6 = 0.833333
    df = spark.createDataFrame(
        [("g", 10, True, 1), ("g", 9, False, 2), ("g", 8, True, 3)],
        "g string, s bigint, y boolean, id bigint",
    )
    row = average_precision(df, "g", F.col("s"), F.col("y"), "id").collect()[0]
    assert (row["n_pos"], row["n"], row["ap"]) == (2, 3, 0.833333)


def test_average_precision_perfect_ranking_is_one(spark):
    df = spark.createDataFrame(
        [("g", 10, True, 1), ("g", 9, True, 2), ("g", 8, False, 3)],
        "g string, s bigint, y boolean, id bigint",
    )
    assert average_precision(df, "g", F.col("s"), F.col("y"), "id").collect()[0][
        "ap"
    ] == 1.0


def test_average_precision_null_label_counts_negative(spark):
    # NULL label must rank (and count) as a negative, not vanish from i
    df = spark.createDataFrame(
        [("g", 10, None, 1), ("g", 9, True, 2)],
        "g string, s bigint, y boolean, id bigint",
    )
    row = average_precision(df, "g", F.col("s"), F.col("y"), "id").collect()[0]
    assert (row["n_pos"], row["n"], row["ap"]) == (1, 2, 0.5)


# --------------------------------------------------------------------------
# SQ8 quantization
# --------------------------------------------------------------------------

def test_sq8_codebook_matches_python(spark):
    vals = [[1, 5, -3], [2, -7, 9]]
    df = spark.createDataFrame(
        [(v,) for v in vals], "vm array<bigint>"
    )
    assert sq8_codebook(df, "vm") == [(1, 2), (-7, 5), (-3, 9)]


def test_sq8_recall_perfect_when_spacing_dwarfs_quant_error(spark):
    # 12 collinear points spaced 10_000 micro apart; SQ8's max decode
    # error is rng/255 ~ 431 micro, far below the spacing, so quantized
    # top-k MUST equal exact top-k -> recall 1.0 for the one query (id 0).
    df = spark.createDataFrame(
        [(i, [i * 0.01, i * 0.01]) for i in range(12)],
        "vec_id bigint, embedding array<double>",
    )
    out = sq8_quantize_recall(df, "vec_id", "embedding", k=5, query_mod=12).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["query_id"], row["n_truth"], row["n_hit"], row["recall"]) == (
        0, 5, 5, 1.0,
    )


def test_kcore_query_rounds_reach_fixpoint_on_real_graph(spark):
    """The registered query unrolls 12 rounds; pin that this IS the
    fixpoint on the actual co-order graph (measured peel depth: 8 at
    sf0.001, 10 at sf0.01 — the initial guess of 6 was NOT converged,
    caught only by this rounds-vs-rounds+2 comparison)."""
    from ingestion_scripts_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    x, y = b.alias("x"), b.alias("y")
    edges = (
        x.join(y, (F.col("x.bk") == F.col("y.bk")) & (F.col("x.it") < F.col("y.it")))
        .groupBy(F.col("x.it").alias("a"), F.col("y.it").alias("b"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("a", "b")
        .localCheckpoint()
    )
    at_12 = sorted(map(tuple, kcore_peel(edges, "a", "b", k=3, rounds=12).collect()))
    at_14 = sorted(map(tuple, kcore_peel(edges, "a", "b", k=3, rounds=14).collect()))
    assert at_12 == at_14 and len(at_12) > 0


# --------------------------------------------------------------------------
# nDCG@k
# --------------------------------------------------------------------------

def test_ndcg_discount_table_is_frozen():
    from ingestion_scripts_spark.operators.profiling import ndcg_discounts_micro

    # the literal table both engines embed; changing it breaks every
    # recorded hash, so pin it
    assert ndcg_discounts_micro(10) == [
        1000000, 630930, 500000, 430677, 386853,
        356207, 333333, 315465, 301030, 289065,
    ]


def test_ndcg_perfect_worst_and_undefined(spark):
    from ingestion_scripts_spark.operators.profiling import ndcg_at_k

    df = spark.createDataFrame(
        [
            ("perfect", 10, 3, 1), ("perfect", 9, 0, 2),
            ("worst", 1, 3, 11), ("worst", 2, 0, 12),
            ("nopos", 5, 0, 21), ("nopos", 4, 0, 22),
        ],
        "g string, s bigint, rel bigint, id bigint",
    )
    rows = {
        r["g"]: r
        for r in ndcg_at_k(df, "g", F.col("s"), F.col("rel"), "id", k=10).collect()
    }
    assert rows["perfect"]["ndcg"] == 1.0
    # worst: DCG = 3 * disc_2 = 1892790, IDCG = 3 * disc_1 = 3000000
    assert rows["worst"]["dcg_micro"] == 1892790
    assert rows["worst"]["ndcg"] == 0.63093
    assert rows["nopos"]["ndcg"] is None  # 0/0 is undefined, not perfect


# --------------------------------------------------------------------------
# Zipf slope
# --------------------------------------------------------------------------

def _docs_with_counts(spark, counts):
    """One doc per group holding token t{i} repeated counts[i] times."""
    toks = []
    for i, c in enumerate(counts):
        toks.extend([f"t{i:03d}"] * c)
    return spark.createDataFrame([("g", toks)], "g string, t array<string>")


def test_zipf_slope_zero_for_uniform_and_near_minus_one_for_zipf(spark):
    from ingestion_scripts_spark.operators.text_analysis import zipf_slope

    uni = _docs_with_counts(spark, [7] * 20)
    row = zipf_slope(uni, "g", "t", top_n=200).collect()[0]
    assert (row["n_points"], row["slope"]) == (20, 0.0)

    zipf = _docs_with_counts(spark, [10000 // i for i in range(1, 41)])
    row = zipf_slope(zipf, "g", "t", top_n=200).collect()[0]
    assert row["n_points"] == 40
    assert -1.01 < row["slope"] < -0.99


def test_zipf_slope_undefined_under_three_points(spark):
    from ingestion_scripts_spark.operators.text_analysis import zipf_slope

    two = _docs_with_counts(spark, [5, 3])
    row = zipf_slope(two, "g", "t", top_n=200).collect()[0]
    assert row["n_points"] == 2 and row["slope"] is None


# --------------------------------------------------------------------------
# greedy max-coverage + unique vocabulary
# --------------------------------------------------------------------------

def test_max_coverage_greedy_hand_case(spark):
    from ingestion_scripts_spark.operators.text_analysis import max_coverage_select

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),
            (2, ["a", "b"]),
            (3, ["d"]),
            (4, ["c", "d", "e", "f"]),
        ],
        "doc_id bigint, t array<string>",
    )
    out = max_coverage_select(df, "doc_id", "t", k=3).orderBy("rank").collect()
    # round 1: d4 covers 4; round 2: d1 and d2 both gain {a,b} -> min id d1;
    # round 3: everything left gains 0 -> min id d2 (picked docs excluded)
    assert [(r["rank"], r["doc_id"], r["gain"]) for r in out] == [
        (1, 4, 4), (2, 1, 2), (3, 2, 0),
    ]


def test_max_coverage_gains_nonincreasing_and_ids_distinct(spark):
    from ingestion_scripts_spark.functions import text as X
    from ingestion_scripts_spark.operators.text_analysis import max_coverage_select
    from ingestion_scripts_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(
        "doc_id", X.tokenize_ws(X.clean_text(F.col("text"))).alias("t")
    )
    out = max_coverage_select(toks, "doc_id", "t", k=5).orderBy("rank").collect()
    gains = [r["gain"] for r in out]
    assert gains == sorted(gains, reverse=True)  # submodularity
    assert len({r["doc_id"] for r in out}) == len(out)


def test_max_coverage_k10_matches_python_residual_carry(spark):
    """r6 VERDICT item 5 gate: the running-residual form (broadcast
    newest-pick subtraction, plan constant in k) must equal the plain
    greedy that re-subtracts the FULL covered set every round — a stale
    or double-subtracted residual cannot match 10 exact picks+gains on a
    corpus engineered with heavy token overlap between rounds."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i:02d}" for i in range(40)]
    rows = [
        (i, sorted(rng.sample(vocab, rng.randint(3, 15))))
        for i in range(1, 31)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, t array<string>")

    covered: set[str] = set()
    remaining = dict(rows)
    expect = []
    for rank in range(1, 11):
        gains = {i: len(set(t) - covered) for i, t in remaining.items()}
        best = min(gains, key=lambda i: (-gains[i], i))
        expect.append((rank, best, gains[best]))
        covered |= set(remaining.pop(best))

    from ingestion_scripts_spark.operators.text_analysis import max_coverage_select

    out = max_coverage_select(df, "doc_id", "t", k=10).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"], r["gain"]) for r in out] == expect


def test_source_unique_vocab_hand_case(spark):
    from ingestion_scripts_spark.operators.text_analysis import source_unique_vocab

    df = spark.createDataFrame(
        [("g1", ["a", "b", "b"]), ("g2", ["b", "c"])],
        "g string, t array<string>",
    )
    rows = {r["g"]: r for r in source_unique_vocab(df, "g", "t").collect()}
    assert (rows["g1"]["vocab"], rows["g1"]["unique_vocab"]) == (2, 1)  # a
    assert (rows["g2"]["vocab"], rows["g2"]["unique_vocab"]) == (2, 1)  # c
    assert rows["g1"]["unique_ratio"] == 0.5


# --------------------------------------------------------------------------
# personalized PageRank
# --------------------------------------------------------------------------

def test_ppr_mass_flows_only_from_seeds(spark):
    """Hand trace on A(seed)->B, C->B with iters=3: the seed settles at
    the teleport base 150000; B receives 85% of A's base (127500) once
    the initial burst decays; the non-seed source C holds EXACTLY 0 —
    in PPR untrusted nodes with no trusted in-flow never earn mass
    (global pagerank_int would give C its 150000 base)."""
    from ingestion_scripts_spark.operators.graph import personalized_pagerank_int

    edges = spark.createDataFrame(
        [("A", "B", 1), ("C", "B", 1)], "src string, dst string, w bigint"
    )
    seeds = spark.createDataFrame([("A",)], "node string")
    out = {
        r["node"]: r["ppr_u"]
        for r in personalized_pagerank_int(
            edges, "src", "dst", "w", seeds, "node", iters=3
        ).collect()
    }
    assert out == {"A": 150000, "B": 127500, "C": 0}


def test_dedup_funnel_invariants(spark):
    """Funnel laws on real data: survivors non-increasing, removed
    reconciles exactly with the stage-to-stage drop, s0 == table count,
    and the exact stage matches an independent distinct-text count."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    rows = E.queries()["dedup_funnel"](spark, sf).collect()
    assert [r["stage"] for r in rows] == [
        "s0_total", "s1_exact", "s2_minhash", "s3_segment",
    ]
    surv = [r["survivors"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert rows[0]["removed"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["removed"] == prev["survivors"] - cur["survivors"]

    from ingestion_scripts_spark.sources.readers import load_table

    docs = load_table(spark, sf, "documents")
    assert rows[0]["survivors"] == docs.count()
    assert rows[1]["survivors"] == docs.select("text").distinct().count()


def test_pq_recall_exact_when_every_point_is_its_own_centroid(spark):
    """PQ law: with m=1 and ksub = n distinct points, the deterministic
    init (n smallest ids) makes every point its own centroid, ADC equals
    the exact (rounded) distance, and recall MUST be 1.0 — isolates the
    encode/ADC/top-k plumbing from quantization error."""
    from ingestion_scripts_spark.operators.similarity import pq_recall

    df = spark.createDataFrame(
        [(i, [0.1 * i, 1.0 - 0.07 * i]) for i in range(12)],
        "vec_id bigint, embedding array<double>",
    )
    out = pq_recall(
        df, "vec_id", "embedding", m=1, ksub=12, iters=1, k=5, query_mod=12, dim=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["query_id"], r["n_truth"], r["n_hit"], r["recall"]) == (0, 5, 5, 1.0)


def test_conformal_threshold_exact_rank_and_guarantee(spark):
    from ingestion_scripts_spark.operators.profiling import conformal_threshold

    # n=9, alpha=9/10 -> k = ceil(0.9*10) = 9 -> threshold = 9th smallest
    df = spark.createDataFrame(
        [("g", s, i) for i, s in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6])],
        "g string, s bigint, id bigint",
    )
    r = conformal_threshold(df, "g", F.col("s"), "id").collect()[0]
    assert (r["n"], r["k"], r["threshold"]) == (9, 9, 9)
    assert r["coverage"] == 1.0
    # n=4 -> k = ceil(0.9*5) = 5 > n -> undefined, NULL not clamped
    small = spark.createDataFrame(
        [("g", s, i) for i, s in enumerate([1, 2, 3, 4])],
        "g string, s bigint, id bigint",
    )
    r2 = conformal_threshold(small, "g", F.col("s"), "id").collect()[0]
    assert (r2["k"], r2["threshold"], r2["coverage"]) == (5, None, None)
    # empirical coverage >= alpha whenever defined (n=19 -> k=18)
    big = spark.createDataFrame(
        [("g", s, s) for s in range(1, 20)], "g string, s bigint, id bigint"
    )
    r3 = conformal_threshold(big, "g", F.col("s"), "id").collect()[0]
    assert (r3["k"], r3["threshold"]) == (18, 18)
    assert r3["coverage"] >= 0.9


def test_isotonic_bins_laws(spark):
    from ingestion_scripts_spark.operators.profiling import isotonic_bins

    def fit(rows):
        # rows: (score_u, y)
        df = spark.createDataFrame(rows, "s bigint, y boolean")
        return {
            r["bin"]: (r["n"], r["pos_rate_u"], r["iso_u"])
            for r in isotonic_bins(df, F.col("s"), F.col("y")).collect()
        }

    # already-monotone input is a fixed point: iso == pos_rate per bin
    mono = [(50_000, False)] * 4 + [(150_000, True), (150_000, False)] + [
        (250_000, True)
    ] * 3
    out = fit(mono)
    assert all(iso == pos for _, pos, iso in out.values())

    # a single violator pair pools to the weighted mean:
    # bin0 rate 0.8 (4/5), bin1 rate 0.2 (1/5) -> both 0.5
    viol = [(50_000, True)] * 4 + [(50_000, False)] + [(150_000, True)] + [
        (150_000, False)
    ] * 4
    out = fit(viol)
    assert out[0][2] == out[1][2] == 500_000

    # monotone + mass-preserving on a mixed case
    mixed = (
        [(50_000, True)] * 3 + [(50_000, False)]
        + [(150_000, False)] * 3 + [(150_000, True)]
        + [(950_000, True)] * 2
    )
    out = fit(mixed)
    isos = [out[b][2] for b in sorted(out)]
    assert isos == sorted(isos)
    mass_in = sum(n * pos for n, pos, _ in out.values())
    mass_out = sum(n * iso for n, _, iso in out.values())
    assert abs(mass_in - mass_out) <= 10 * len(out)  # rounding only


def test_theil_sen_robust_to_outlier_and_exact_median(spark):
    from ingestion_scripts_spark.operators.profiling import theil_sen_slope

    # clean line y = 2x (micro): all pairwise slopes = 2e6
    clean = [("u", x, 2_000_000 * x) for x in range(1, 6)]
    df = spark.createDataFrame(clean, "g string, x bigint, y bigint")
    r = theil_sen_slope(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert (r["m"], r["slope_u"]) == (10, 2_000_000)

    # one wild outlier (y5 = 100x the line): the pairwise MEDIAN stays on
    # the clean slope while an OLS fit would be dragged far upward
    wild = clean[:-1] + [("u", 5, 1_000_000_000)]
    df2 = spark.createDataFrame(wild, "g string, x bigint, y bigint")
    r2 = theil_sen_slope(df2, "g", F.col("x"), F.col("y")).collect()[0]
    assert r2["slope_u"] == 2_000_000

    # negative slope: trunc-div semantics identical on both engines
    neg = [("u", x, -3_000_000 * x + 1) for x in range(1, 4)]
    df3 = spark.createDataFrame(neg, "g string, x bigint, y bigint")
    r3 = theil_sen_slope(df3, "g", F.col("x"), F.col("y")).collect()[0]
    assert r3["slope_u"] == -3_000_000

    # single-point groups are excluded (undefined)
    one = spark.createDataFrame([("v", 1, 5)], "g string, x bigint, y bigint")
    assert theil_sen_slope(one, "g", F.col("x"), F.col("y")).count() == 0
