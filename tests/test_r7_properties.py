"""Property-based tests for the r7 operators (style: test_r6_properties —
Hypothesis generates adversarial small inputs, a literal pure-Python
reimplementation is the oracle). Covers the kernels with interesting input
spaces: Kendall tau-b (tie structure), Wasserstein-1 (support gaps and
duplicate masses), pinball loss (the minimizer property over arbitrary
multisets), KMV merge (arbitrary group overlaps), and RBO (arbitrary
ranking divergence)."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.profiling import (
    kendall_tau,
    pinball_loss,
    wasserstein_1d,
)
from ingestion_scripts_spark.operators.retrieval import (
    rbo_overlap,
    rbo_weights_pico,
)
from ingestion_scripts_spark.operators.sketches import kmv_sketch


def _ref_tau(pts):
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
    return c, d, round(
        (c - d) / math.sqrt((n0 - tx) * (n0 - ty)), 6
    )


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=2,
        max_size=14,
    )
)
def test_kendall_tau_property(spark, pts):
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    rows = kendall_tau(df, "g", F.col("x"), F.col("y")).collect()
    c, d, tau = _ref_tau(pts)
    has_lex_pair = any(
        (a, b) != (x, y) for (a, b) in pts for (x, y) in pts
    )
    if not has_lex_pair:
        assert rows == []  # all points identical: no pairs survive
        return
    got = rows[0]
    assert (got["concordant"], got["discordant"]) == (c, d)
    if tau is None:
        assert got["tau_b"] is None
    else:
        assert abs(got["tau_b"] - tau) < 2e-6


def _ref_w1(xs, ys):
    support = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    num = 0
    for v, nxt in zip(support, support[1:]):
        ca = sum(1 for x in xs if x <= v)
        cb = sum(1 for y in ys if y <= v)
        num += abs(ca * nb - cb * na) * (nxt - v)
    return num, round(num / (na * nb), 6)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=12),
    st.lists(st.integers(0, 30), min_size=1, max_size=12),
)
def test_wasserstein_property(spark, xs, ys):
    rows = [("g", v, True) for v in xs] + [("g", v, False) for v in ys]
    df = spark.createDataFrame(rows, "g string, vm long, a boolean")
    got = wasserstein_1d(df, "g", F.col("vm"), F.col("a")).collect()[0]
    num, w1 = _ref_w1(xs, ys)
    assert got["w1_num"] == num
    assert abs(got["w1"] - round(w1 / 1e6 * 1e6, 6) / 1) < 2e-6 or got[
        "w1_num"
    ] == num  # w1 is num/(na*nb)/1e6 — compare through the exact numerator
    # half-up rounding (the engine's floor(x*1e6+0.5) idiom), NOT python
    # round(): banker's rounding disagrees at exact .5 boundaries —
    # Hypothesis found xs=[0], ys=[0,1] (w1 = 5e-7 -> engine 1e-6,
    # python round 0.0) in r10. Derived entirely in INTEGERS: the r10 fix
    # itself went through two float divisions before the floor, which can
    # double-round against the engine's exact arithmetic at .5 boundaries
    # for large numerators (ADVICE r10).
    na_nb = len(xs) * len(ys)
    assert got["w1"] == ((2 * num + na_nb) // (2 * na_nb)) / 1e6


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=20))
def test_pinball_minimizer_property(spark, ys):
    df = spark.createDataFrame([("g", y) for y in ys], "g string, y long")
    got = pinball_loss(df, "g", F.col("y"), q_num=9, q_den=10).collect()[0]

    def loss(yhat):
        return sum(9 * (y - yhat) if y >= yhat else (yhat - y) for y in ys)

    n = len(ys)
    expect_yhat = sorted(ys)[(9 * n + 9) // 10 - 1]
    assert got["yhat"] == expect_yhat
    assert got["loss_sum_scaled"] == loss(expect_yhat)
    # the defining property on EVERY generated multiset
    assert loss(expect_yhat) <= loss(expect_yhat + 1)
    assert loss(expect_yhat) <= loss(expect_yhat - 1)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=25),
    st.lists(st.integers(0, 60), min_size=1, max_size=25),
)
def test_kmv_merge_property(spark, ids_a, ids_b):
    """Bottom-k of the union of two sketches == sketch of the union, for
    arbitrary overlap structures (k larger than the union here, so the
    law is exact set equality of hashes)."""
    rows = [("a", f"u{i}") for i in ids_a] + [("b", f"u{i}") for i in ids_b]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch(df, "g", F.col("v"), k=64)
    merged = {r["h"] for r in sk.select("h").distinct().collect()}
    direct = {
        r["h"]
        for r in kmv_sketch(
            df.select(F.lit("all").alias("g"), "v"), "g", F.col("v"), k=64
        ).collect()
    }
    assert merged == direct


@settings(max_examples=6, deadline=None)
@given(st.permutations(list(range(12))))
def test_rbo_property(spark, perm):
    depth = 12
    base = [f"k{i}" for i in range(depth)]
    other = [f"k{i}" for i in perm]
    a = spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(base)], "key string, rank long"
    )
    b = spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(other)], "key string, rank long"
    )
    got = rbo_overlap(a, b, depth=depth, p=0.9).collect()[0]
    w = rbo_weights_pico(depth, 0.9)
    pos_a = {k: i + 1 for i, k in enumerate(base)}
    pos_b = {k: i + 1 for i, k in enumerate(other)}
    expect = 0
    for d in range(1, depth + 1):
        ov = sum(1 for k in base if max(pos_a[k], pos_b[k]) <= d)
        expect += (w[d - 1] * ov) // d
    assert got["rbo_pico"] == expect
    # permutations of the same set always fully agree at full depth
    assert got["n_common"] == depth
