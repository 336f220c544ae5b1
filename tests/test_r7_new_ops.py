"""Law tests for the r7 operator batch (KMV sketch, Wasserstein-1,
Kendall tau-b, MRR, link prediction, exact ACF, aHash) — each pinned
against an INDEPENDENT pure-Python reference or hand-derived expectation,
never the oracle formula (the kcore/isotonic lesson: a Spark/DuckDB
differential cannot see a bug both engines share)."""

import math
import random

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.graph import link_prediction_scores
from ingestion_scripts_spark.operators.multimodal import (
    ahash_bands,
    ahash_near_dup_pairs,
)
from ingestion_scripts_spark.operators.profiling import (
    autocorrelation,
    kendall_tau,
    mean_reciprocal_rank,
    wasserstein_1d,
)
from ingestion_scripts_spark.operators.sketches import (
    KMV_SPACE,
    kmv_estimate,
    kmv_sketch,
)


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------

def test_kmv_exact_below_k_and_merge_law(spark):
    rows = [("a", f"u{i}") for i in range(30)] + [
        ("b", f"u{i}") for i in range(10, 50)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, "g", F.col("v"), k=64)
    est = {r["g"]: r for r in kmv_estimate(sk, k=64).collect()}
    # below k: exact counts, kth_hash undefined
    assert (est["a"]["m"], est["a"]["est"], est["a"]["kth_hash"]) == (30, 30, None)
    assert est["b"]["est"] == 40

    # merge law: bottom-64 of the union of per-group sketches == the
    # sketch built directly from the union of the raw data (EXACT, not
    # statistical — this is what makes sketch rollups trustworthy)
    union_direct = kmv_sketch(
        df.select(F.lit("all").alias("g"), "v"), "g", F.col("v"), k=64
    )
    merged = (
        sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(64)
        .select(F.lit("all").alias("g"), "h")
    )
    a = {r["h"] for r in union_direct.collect()}
    b = {r["h"] for r in merged.collect()}
    assert a == b


def test_kmv_estimator_tracks_true_cardinality(spark):
    n = 5000
    df = spark.createDataFrame(
        [("g", f"user-{i}") for i in range(n)], "g string, v string"
    )
    est = kmv_estimate(kmv_sketch(df, "g", F.col("v"), k=64), k=64).collect()[0]
    assert est["m"] == 64
    # KMV relative error ~ 1/sqrt(k) = 12.5%; assert a loose 3-sigma band
    assert 0.6 * n < est["est"] < 1.4 * n
    # the estimator formula itself, recomputed from the returned kth hash
    assert est["est"] == math.floor(63 * KMV_SPACE / est["kth_hash"])


# --------------------------------------------------------------------------
# Wasserstein-1
# --------------------------------------------------------------------------

def _w1_python(xs, ys):
    """Independent reference: integral of |CDF_A - CDF_B| over the support
    (exact for point masses)."""
    support = sorted(set(xs) | set(ys))
    w1 = 0.0
    for v, nxt in zip(support, support[1:]):
        fa = sum(1 for x in xs if x <= v) / len(xs)
        fb = sum(1 for y in ys if y <= v) / len(ys)
        w1 += abs(fa - fb) * (nxt - v)
    return w1


def test_wasserstein_shift_law_and_python_reference(spark):
    rng = random.Random(3)
    xs = [rng.randint(0, 100) for _ in range(40)]
    delta = 17
    ys = [x + delta for x in xs]  # pure shift: W1 == delta exactly
    rows = [("g", x * 1_000_000, True) for x in xs] + [
        ("g", y * 1_000_000, False) for y in ys
    ]
    df = spark.createDataFrame(rows, "g string, vm long, a boolean")
    out = wasserstein_1d(df, "g", F.col("vm"), F.col("a")).collect()[0]
    assert out["w1"] == float(delta)

    zs = [rng.randint(0, 100) for _ in range(25)]
    rows = [("g", x * 1_000_000, True) for x in xs] + [
        ("g", z * 1_000_000, False) for z in zs
    ]
    df = spark.createDataFrame(rows, "g string, vm long, a boolean")
    out = wasserstein_1d(df, "g", F.col("vm"), F.col("a")).collect()[0]
    assert abs(out["w1"] - _w1_python(xs, zs)) < 1e-6


def test_wasserstein_identical_samples_is_zero(spark):
    rows = [("g", v, i % 2 == 0) for i, v in enumerate([5, 5, 9, 9, 12, 12])]
    df = spark.createDataFrame(rows, "g string, vm long, a boolean")
    out = wasserstein_1d(df, "g", F.col("vm"), F.col("a")).collect()[0]
    assert out["w1_num"] == 0 and out["w1"] == 0.0


# --------------------------------------------------------------------------
# Kendall tau-b
# --------------------------------------------------------------------------

def _tau_b_python(pts):
    """Independent O(n^2) reference over ALL unordered pairs."""
    n = len(pts)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    if n0 - tx <= 0 or n0 - ty <= 0:
        return c, d, None
    return c, d, (c - d) / math.sqrt((n0 - tx) * (n0 - ty))


def test_kendall_tau_matches_python_with_ties(spark):
    rng = random.Random(5)
    pts = [(rng.randint(0, 6), rng.randint(0, 6)) for _ in range(30)]
    pts += [pts[0], pts[1]]  # force duplicate points (x AND y tied)
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    out = kendall_tau(df, "g", F.col("x"), F.col("y")).collect()[0]
    c, d, tau = _tau_b_python(pts)
    assert (out["concordant"], out["discordant"]) == (c, d)
    assert abs(out["tau_b"] - tau) < 1e-6


def test_kendall_tau_perfect_and_reversed(spark):
    up = [("g", i, 10 * i) for i in range(8)]
    down = [("h", i, -3 * i) for i in range(8)]
    df = spark.createDataFrame(up + down, "g string, x long, y long")
    rows = {r["g"]: r for r in kendall_tau(df, "g", F.col("x"), F.col("y")).collect()}
    assert rows["g"]["tau_b"] == 1.0
    assert rows["h"]["tau_b"] == -1.0


def test_kendall_tau_degenerate_all_tied_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 1, 1), ("g", 1, 1)], "g string, x long, y long"
    )
    assert kendall_tau(df, "g", F.col("x"), F.col("y")).count() == 0


# --------------------------------------------------------------------------
# MRR
# --------------------------------------------------------------------------

def test_mrr_first_hit_rank_and_no_hit_zero(spark):
    rows = [
        ("q1", 90, 0, 1), ("q1", 80, 0, 2), ("q1", 70, 1, 3), ("q1", 60, 1, 4),
        ("q2", 50, 0, 5), ("q2", 40, 0, 6),
    ]
    df = spark.createDataFrame(rows, "g string, s long, rel int, id long")
    out = {
        r["g"]: r
        for r in mean_reciprocal_rank(
            df, "g", F.col("s"), F.col("rel"), "id"
        ).collect()
    }
    assert (out["q1"]["first_rank"], out["q1"]["rr_micro"]) == (3, 333333)
    assert (out["q2"]["first_rank"], out["q2"]["rr_micro"]) == (None, 0)


# --------------------------------------------------------------------------
# link prediction
# --------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_link_prediction_path_hand_case(spark):
    # path 1-2-3: only candidate (1,3) through z=2 (deg 2)
    out = link_prediction_scores(_edges(spark, [(1, 2), (2, 3)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["w"], r["common"]) == (1, 3, 1)
    assert r["jaccard_micro"] == 1_000_000  # deg 1 + deg 1 - 1 == 1
    assert r["aa_micro"] == math.floor(1_000_000 / math.log(2) + 0.5)


def test_link_prediction_excludes_existing_edges(spark):
    # triangle: every 2-hop pair is already an edge -> no candidates
    out = link_prediction_scores(_edges(spark, [(1, 2), (1, 3), (2, 3)]))
    assert out.count() == 0


def test_link_prediction_hub_cap_blocks_intermediary(spark):
    # star around z=100 with 5 leaves; cap at 4 removes every wedge
    star = [(i, 100) for i in range(1, 6)]
    assert link_prediction_scores(_edges(spark, star), max_degree=4).count() == 0
    full = link_prediction_scores(_edges(spark, star), max_degree=500).collect()
    assert len(full) == 10  # C(5,2) leaf pairs
    aw = math.floor(1_000_000 / math.log(5) + 0.5)
    assert all(r["common"] == 1 and r["aa_micro"] == aw for r in full)


# --------------------------------------------------------------------------
# autocorrelation
# --------------------------------------------------------------------------

def _acf_python(ys, k):
    n = len(ys)
    m = sum(ys) / n
    den = sum((y - m) ** 2 for y in ys)
    num = sum((ys[i] - m) * (ys[i + k] - m) for i in range(n - k))
    return num / den


def test_acf_matches_python_on_weekly_pattern(spark):
    rng = random.Random(9)
    ys = [1000 + 300 * (i % 7 == 0) + rng.randint(-20, 20) for i in range(60)]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "x long, y long"
    )
    out = {r["lag"]: r for r in autocorrelation(df, F.col("x"), F.col("y"), 7).collect()}
    for k in range(1, 8):
        assert out[k]["n_pairs"] == 60 - k
        assert abs(out[k]["acf"] - _acf_python(ys, k)) < 1e-6
    # the weekly spike must dominate
    assert out[7]["acf"] > max(out[k]["acf"] for k in range(1, 7))


def test_acf_constant_series_is_undefined(spark):
    df = spark.createDataFrame([(i, 42) for i in range(10)], "x long, y long")
    out = autocorrelation(df, F.col("x"), F.col("y"), 3).collect()
    assert all(r["acf"] is None for r in out)


def test_acf_respects_index_gaps_not_row_adjacency(spark):
    # x = 0,1,3 : lag-1 pairs are (0,1) ONLY; (1,3) is lag 2
    df = spark.createDataFrame([(0, 1), (1, 5), (3, 9)], "x long, y long")
    out = {r["lag"]: r["n_pairs"] for r in autocorrelation(df, F.col("x"), F.col("y"), 3).collect()}
    assert out.get(1) == 1 and out.get(2) == 1 and out.get(3) == 1
    # lag 2 pairs: (1,3); lag 3: (0,3)


# --------------------------------------------------------------------------
# aHash
# --------------------------------------------------------------------------

def _ahash_python(payload: bytes):
    import base64

    s = base64.b64encode(payload).decode()
    if not s:
        return (None,) * 4
    s64 = (s * (64 // len(s) + 1))[:64]
    px = [ord(c) for c in s64]
    tot = sum(px)
    bits = [1 if 64 * p > tot else 0 for p in px]
    return tuple(
        sum(bit << (15 - j) for j, bit in enumerate(bits[i * 16 : (i + 1) * 16]))
        for i in range(4)
    )


def test_ahash_bands_match_python(spark):
    rows = [(1, b"hello world, this is a payload"), (2, b"x"), (3, b"")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in ahash_bands(df).collect()}
    for mid, payload in rows:
        exp = _ahash_python(payload)
        got = (out[mid]["b0"], out[mid]["b1"], out[mid]["b2"], out[mid]["b3"])
        assert got == exp, (mid, got, exp)


def test_ahash_pair_completeness_vs_brute_force(spark):
    """Pigeonhole law: the banded candidate join must find EVERY pair at
    hamming <= 3 — compared against an all-pairs brute force on a corpus
    engineered to contain near-identical payloads."""
    rng = random.Random(13)
    base = bytearray(rng.getrandbits(8) for _ in range(45))
    rows = [(1, bytes(base))]
    for i in range(2, 12):
        mut = bytearray(base)
        for _ in range(rng.randint(0, 2)):  # small perturbations
            mut[rng.randrange(len(mut))] = rng.getrandbits(8)
        rows.append((i, bytes(mut)))
    for i in range(12, 20):  # unrelated payloads
        rows.append((i, bytes(rng.getrandbits(8) for _ in range(45))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ahash_near_dup_pairs(ahash_bands(df), max_hamming=3).collect()
    }

    hashes = {mid: _ahash_python(p) for mid, p in rows}
    expect = set()
    for i, _ in rows:
        for j, _ in rows:
            if i < j:
                ham = sum(
                    bin(a ^ b).count("1")
                    for a, b in zip(hashes[i], hashes[j])
                )
                if ham <= 3:
                    expect.add((i, j, ham))
    assert got == expect and expect  # non-vacuous: the corpus has near-dups
