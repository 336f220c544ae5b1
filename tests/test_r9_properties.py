"""Law/property tests for the r9 additions — independent pure-Python
references (NOT the oracle formulas), per the differential-blindness
rule: the DuckDB twin shares design decisions, so every operator needs a
check derived from the textbook definition instead.

Covers: order_statistics (sorted-list ceil-rank reference + tie
clamps), mann_kendall (textbook S/variance on tie-heavy series +
closed forms for monotone and constant series), degree_assortativity
(star = −1 exactly, cycle = undefined, path vs hand computation),
fd_strength (exact-FD and known-violation constructions)."""

import math
import random

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.dq import fd_strength
from ingestion_scripts_spark.operators.graph import degree_assortativity
from ingestion_scripts_spark.operators.profiling import mann_kendall
from ingestion_scripts_spark.operators.ranking import order_statistics


# ---------------------------------------------------------------- ranking

def test_order_statistics_matches_sorted_list(spark):
    rng = random.Random(13)
    rows = [(rng.randrange(20), i) for i in range(487)]  # heavy ties
    df = spark.createDataFrame(rows, "v int, id int")
    qs = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100), (1, 487)]
    got = {
        (r.q_num, r.q_den): (r.r, r.value)
        for r in order_statistics(df, "v", ["id"], qs, num_partitions=8).collect()
    }
    ordered = sorted(rows)
    n = len(ordered)
    for qn, qd in qs:
        r = max(1, -(-qn * n // qd))  # ceil
        assert got[(qn, qd)] == (r, ordered[r - 1][0]), (qn, qd)


def test_order_statistics_rank_clamps_to_one(spark):
    df = spark.createDataFrame([(5, 1), (3, 2)], "v int, id int")
    out = {
        (r.q_num, r.q_den): r.value
        for r in order_statistics(df, "v", ["id"], [(1, 1000)]).collect()
    }
    assert out[(1, 1000)] == 3  # ceil(2/1000)=1 clamped, min value


# ------------------------------------------------------------ mann-kendall

def _mk_reference(vals):
    n = len(vals)
    s = sum(
        (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(t * (t - 1) * (2 * t + 5) for t in Counter(vals).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie
    if var18 <= 0:
        z = 0.0
    elif s > 0:
        z = (s - 1) / math.sqrt(var18 / 18.0)
    elif s < 0:
        z = (s + 1) / math.sqrt(var18 / 18.0)
    else:
        z = 0.0
    return s, var18, math.floor(z * 1e6 + 0.5)


def _mk_run(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v int"
    )
    r = mann_kendall(df, "t", "v").collect()[0]
    return r.s_stat, r.var18, r.z_micro, r.n_points


def test_mann_kendall_textbook_on_tie_heavy_series(spark):
    rng = random.Random(99)
    vals = [rng.randrange(6) for _ in range(60)]
    s, var18, zm = _mk_reference(vals)
    gs, gv, gz, gn = _mk_run(spark, vals)
    assert (gs, gv, gz, gn) == (s, var18, zm, 60)


def test_mann_kendall_monotone_closed_form(spark):
    vals = list(range(25))  # strictly increasing, no ties
    gs, gv, gz, _ = _mk_run(spark, vals)
    assert gs == 25 * 24 // 2
    assert gv == 25 * 24 * 55
    assert gz == math.floor((gs - 1) / math.sqrt(gv / 18.0) * 1e6 + 0.5)


def test_mann_kendall_constant_series_is_degenerate_zero(spark):
    gs, gv, gz, _ = _mk_run(spark, [7] * 12)
    assert (gs, gv, gz) == (0, 0, 0)


def test_mann_kendall_sign_symmetry(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    s1, v1, z1, _ = _mk_run(spark, vals)
    s2, v2, z2, _ = _mk_run(spark, [-v for v in vals])
    assert (s2, v2) == (-s1, v1)
    assert z2 == -z1 or abs(z1 + z2) <= 1  # floor snap asymmetry ±1 µ


# ----------------------------------------------------- degree assortativity

def _assort_run(spark, edges):
    df = spark.createDataFrame(edges, "a int, b int")
    return degree_assortativity(df).collect()[0]


def test_assortativity_star_is_minus_one(spark):
    r = _assort_run(spark, [(0, i) for i in range(1, 6)])
    assert r.r_micro == -1_000_000


def test_assortativity_cycle_is_undefined(spark):
    # 4-cycle: every degree 2 — zero degree variance, r undefined
    r = _assort_run(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    assert r.r_micro is None and r.m2 == 8


def test_assortativity_path_matches_hand_computation(spark):
    # P4: degrees 1,2,2,1; directed edges (deg pairs):
    # (1,2),(2,1),(2,2),(2,2),(2,1),(1,2) -> M=6, sx=10, sxx=18, sxy=16
    r = _assort_run(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.m2, r.sx, r.sxx, r.sxy) == (6, 10, 18, 16)
    num, den = 6 * 16 - 100, 6 * 18 - 100
    assert r.r_micro == math.floor(num / den * 1e6 + 0.5)


# ------------------------------------------------------------- fd strength

def test_fd_strength_exact_dependency(spark):
    rows = [(i, i % 7, (i % 7) * 2) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, k int, d int")
    r = fd_strength(df, [("k", "d")]).collect()[0]
    assert (r.violations, r.strength_ppm, r.max_dep_values) == (0, 1_000_000, 1)
    assert (r.n_groups, r.n_rows) == (7, 200)


def test_fd_strength_known_violations(spark):
    # determinant k=0: dep values 0(x3) and 1(x2) -> keep 3, violate 2;
    # k=1: single dep value -> clean
    rows = [(0, 0), (0, 0), (0, 0), (0, 1), (0, 1), (1, 9)]
    df = spark.createDataFrame(rows, "k int, d int")
    r = fd_strength(df, [("k", "d")]).collect()[0]
    assert (r.n_rows, r.violations) == (6, 2)
    assert r.strength_ppm == (4 * 1_000_000) // 6
    assert r.max_dep_values == 2


def test_fd_strength_multiple_pairs_one_row_each(spark):
    rows = [(i, i % 3, i % 2) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    out = fd_strength(df, [("a", "b"), ("b", "a"), ("id", "a")]).collect()
    by = {(r.determinant, r.dependent): r for r in out}
    assert len(out) == 3
    assert by[("id", "a")].violations == 0  # id is a key
    # a -> b over i%3, i%2: each a-group sees both b values (cycle 6)
    assert by[("a", "b")].max_dep_values == 2


# ---------------------------------------------------------- top share curve

def test_top_share_curve_matches_sorted_reference(spark):
    from ingestion_scripts_spark.operators.ranking import top_share_curve

    rng = random.Random(7)
    rows = [(rng.randrange(1000) * 10, i) for i in range(333)]  # tie-heavy
    df = spark.createDataFrame(rows, "v int, id int")
    fracs = [(1, 100), (1, 10), (1, 4), (1, 2)]
    got = {
        (r.f_num, r.f_den): (r.k, r.top_value, r.total_value, r.share_ppm)
        for r in top_share_curve(df, "v", ["id"], fracs, num_partitions=8).collect()
    }
    ordered = sorted(rows, key=lambda t: (-t[0], t[1]))
    n, tot = len(ordered), sum(t[0] for t in ordered)
    for fn, fd in fracs:
        k = max(1, fn * n // fd)
        top = sum(t[0] for t in ordered[:k])
        assert got[(fn, fd)] == (k, top, tot, top * 1_000_000 // tot), (fn, fd)


def test_top_share_curve_full_fraction_is_everything(spark):
    from ingestion_scripts_spark.operators.ranking import top_share_curve

    df = spark.createDataFrame([(5, 1), (7, 2), (9, 3)], "v int, id int")
    r = top_share_curve(df, "v", ["id"], [(1, 1)]).collect()[0]
    assert (r.k, r.top_value, r.share_ppm) == (3, 21, 1_000_000)


# ---------------------------------------------------------- weighted median

def _wm_reference(rows):
    # rows: (k, v, w, t) — lower weighted median per key, textbook scan
    from collections import defaultdict

    per = defaultdict(list)
    for k, v, w, t in rows:
        per[k].append((v, t, w))
    out = {}
    for k, items in per.items():
        items.sort()
        total = sum(w for _, _, w in items)
        cum = 0
        for v, _, w in items:
            cum += w
            if 2 * cum >= total:
                out[k] = (total, v)
                break
    return out


def test_weighted_median_textbook(spark):
    from ingestion_scripts_spark.operators.profiling import weighted_median_by_key

    rng = random.Random(23)
    rows = [
        (i % 9, rng.randrange(12), rng.randrange(5), i)  # zero weights too
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k int, v int, w int, t int")
    got = {
        r.k: (r.w_total, r.median_v)
        for r in weighted_median_by_key(df, "k", "v", "w", ["t"]).collect()
    }
    assert got == _wm_reference(rows)


def test_weighted_median_outlier_mass_moves_it(spark):
    from ingestion_scripts_spark.operators.profiling import weighted_median_by_key

    # values 1..5 weight 1 each, plus value 100 with weight 10: the
    # weighted median jumps to 100 (row median would say 3-4)
    rows = [(0, v, 1, v) for v in range(1, 6)] + [(0, 100, 10, 99)]
    df = spark.createDataFrame(rows, "k int, v int, w int, t int")
    r = weighted_median_by_key(df, "k", "v", "w", ["t"]).collect()[0]
    assert (r.w_total, r.median_v) == (15, 100)


# ----------------------------------------------------- market concentration

def test_market_concentration_monopoly_and_equal_split(spark):
    from ingestion_scripts_spark.operators.profiling import market_concentration

    rows = (
        [("mono", 1, 50)] * 4
        + [("equal8", s, 10) for s in range(8) for _ in range(2)]
    )
    df = spark.createDataFrame(rows, "mkt string, seller int, r int")
    out = {
        r.market: r
        for r in market_concentration(
            df, "mkt", "seller", F.expr("sum(r)"), top_k=4
        ).collect()
    }
    mono = out["mono"]
    assert (mono.n_sellers, mono.hhi_ppm, mono.cr_ppm) == (1, 1_000_000, 1_000_000)
    eq = out["equal8"]
    # 8 equal sellers: HHI = 1/8, CR4 = 1/2 exactly
    assert (eq.n_sellers, eq.hhi_ppm, eq.cr_ppm) == (8, 125_000, 500_000)


def test_market_concentration_hand_top4(spark):
    from ingestion_scripts_spark.operators.profiling import market_concentration

    shares = [40, 25, 15, 10, 6, 4]  # CR4 = 90%, HHI known
    rows = [("m", i, s) for i, s in enumerate(shares)]
    df = spark.createDataFrame(rows, "mkt string, seller int, r int")
    r = market_concentration(df, "mkt", "seller", F.expr("sum(r)"), 4).collect()[0]
    assert r.cr_ppm == 900_000
    assert r.hhi_ppm == sum(s * s for s in shares) * 1_000_000 // 10_000


# ------------------------------------------------------------ seasonal MASE

def _mase_reference(vals, season=7):
    n = len(vals)
    e1 = sum(abs(vals[i] - vals[i - 1]) for i in range(1, n))
    es = sum(abs(vals[i] - vals[i - season]) for i in range(season, n))
    mase = (
        ((es * 1_000_000) // e1) * (n - 1) // (n - season)
        if n > season and e1 > 0
        else None
    )
    return n, e1, es, mase


def _mase_run(spark, vals, season=7):
    from ingestion_scripts_spark.operators.profiling import seasonal_naive_mase

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "t int, v int"
    )
    r = seasonal_naive_mase(df, "t", "v", season=season).collect()[0]
    return r.n_points, r.sum_abs_e1, r.sum_abs_es, r.mase_micro


def test_mase_textbook_random_series(spark):
    rng = random.Random(5)
    vals = [rng.randrange(1000) for _ in range(40)]
    assert _mase_run(spark, vals) == _mase_reference(vals)


def test_mase_perfect_weekly_period_is_zero(spark):
    vals = [10, 20, 30, 40, 50, 60, 70] * 5  # exact period 7
    n, e1, es, mase = _mase_run(spark, vals)
    assert (es, mase) == (0, 0)
    assert e1 > 0


def test_mase_constant_series_degenerate_null(spark):
    n, e1, es, mase = _mase_run(spark, [5] * 20)
    assert (e1, es, mase) == (0, 0, None)


def test_mase_too_short_series_null(spark):
    assert _mase_run(spark, [1, 5, 2, 8], season=7)[3] is None


# ------------------------------------------------------------- apportionment

def _apportion_reference(counts, budget):
    n = sum(counts.values())
    base = {k: c * budget // n for k, c in counts.items()}
    rem = {k: c * budget % n for k, c in counts.items()}
    left = budget - sum(base.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    return {
        k: base[k] + (1 if i < left else 0) for i, k in enumerate(order)
    }


def test_apportionment_textbook_and_sum_law(spark):
    from ingestion_scripts_spark.operators.ranking import (
        largest_remainder_apportionment,
    )

    rng = random.Random(3)
    rows = [(f"s{rng.randrange(13):02d}",) for _ in range(700)]
    df = spark.createDataFrame(rows, "k string")
    for budget in (1, 17, 100, 9999):
        got = {
            r.k: r.alloc
            for r in largest_remainder_apportionment(df, "k", budget).collect()
        }
        counts = {}
        for (k,) in rows:
            counts[k] = counts.get(k, 0) + 1
        assert got == _apportion_reference(counts, budget), budget
        assert sum(got.values()) == budget  # THE apportionment law


def test_apportionment_quota_property(spark):
    from ingestion_scripts_spark.operators.ranking import (
        largest_remainder_apportionment,
    )

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = {
        r.k: (r.base_alloc, r.alloc)
        for r in largest_remainder_apportionment(df, "k", 7).collect()
    }
    # exact shares: a=3.5, b=2.1, c=1.4 -> floors 3,2,1; leftover 1 goes
    # to the largest remainder (a, .5)
    assert out == {"a": (3, 4), "b": (2, 2), "c": (1, 1)}


# ---------------------------------------------------------- vocab richness

def test_species_richness_hand_case(spark):
    from ingestion_scripts_spark.operators.text_analysis import species_richness

    # tokens: a x3, b x2, c x2, d x1, e x1, f x1 -> V=6, N=10, f1=3, f2=2
    docs = spark.createDataFrame(
        [(["a", "a", "b", "c", "d"],), (["a", "b", "c", "e", "f"],)],
        "toks array<string>",
    )
    r = species_richness(docs, "toks").collect()[0]
    assert (r.v_obs, r.n_tokens, r.f1, r.f2) == (6, 10, 3, 2)
    assert r.chao1_est == 6 + (3 * 3) // (2 * 2)
    assert r.coverage_ppm == 1_000_000 - 3 * 1_000_000 // 10


def test_species_richness_all_unique_zero_coverage(spark):
    from ingestion_scripts_spark.operators.text_analysis import species_richness

    docs = spark.createDataFrame([(["x", "y", "z"],)], "toks array<string>")
    r = species_richness(docs, "toks").collect()[0]
    assert (r.v_obs, r.f1, r.f2) == (3, 3, 0)
    assert r.chao1_est is None  # f2 = 0 -> undefined, caller's fallback
    assert r.coverage_ppm == 0


def test_species_richness_chao1_lower_bound_property(spark):
    from ingestion_scripts_spark.operators.text_analysis import species_richness

    rng = random.Random(17)
    docs = spark.createDataFrame(
        [([f"w{rng.randrange(40)}" for _ in range(20)],) for _ in range(25)],
        "toks array<string>",
    )
    r = species_richness(docs, "toks").collect()[0]
    if r.chao1_est is not None:
        assert r.chao1_est >= r.v_obs  # estimator never below observed
    assert 0 <= r.coverage_ppm <= 1_000_000
