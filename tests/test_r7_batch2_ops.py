"""Law tests for the r7 batch-2 kernels (seasonal decomposition, Fano
factor, modularity) — independent pure-Python references and hand-derived
expectations, never the oracle formula."""

import random

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.graph import modularity
from ingestion_scripts_spark.operators.profiling import (
    fano_factor,
    seasonal_decompose_daily,
)


# --------------------------------------------------------------------------
# seasonal decomposition
# --------------------------------------------------------------------------

def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    """On a pure trend+seasonal series (no noise) the decomposition must
    recover the planted seasonal offsets exactly (in period-scaled units)
    and leave zero residual away from edges."""
    period = 7
    season = [0, 70, -35, 14, -14, 28, -63]  # sums to 0, multiples of 7
    ys = [1000 + season[i % 7] for i in range(35)]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "x long, y long"
    )
    out = {
        r["x"]: r
        for r in seasonal_decompose_daily(
            df, F.col("x"), F.col("y"), period
        ).collect()
    }
    assert len(out) == 35
    for i in range(35):
        r = out[i]
        if i < 3 or i >= 32:  # incomplete centered window
            assert r["trend_sum"] is None and r["residual_s"] is None
        else:
            # flat trend: the 7-day window sum is exactly 7*1000 + 0
            assert r["trend_sum"] == 7000
            assert r["detrended_s"] == 7 * season[i % 7]
            assert r["seasonal_s"] == 7 * season[i % 7]
            assert r["residual_s"] == 0


def test_seasonal_decompose_gap_voids_window(spark):
    # days 0..9 with day 5 missing: every window overlapping the gap has
    # win_n < 7 -> NULL trend; nothing silently uses non-adjacent days
    xs = [x for x in range(10) if x != 5]
    df = spark.createDataFrame([(x, 100) for x in xs], "x long, y long")
    out = {r["x"]: r for r in seasonal_decompose_daily(df, F.col("x"), F.col("y"), 7).collect()}
    assert all(out[x]["trend_sum"] is None for x in xs)


def test_seasonal_decompose_python_reference_with_noise(spark):
    rng = random.Random(21)
    ys = [500 + 40 * ((i * 3) % 7) + rng.randint(-9, 9) for i in range(40)]
    period, half = 7, 3
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "x long, y long"
    )
    out = {r["x"]: r for r in seasonal_decompose_daily(df, F.col("x"), F.col("y"), period).collect()}

    # independent reference
    trend = {
        i: sum(ys[i - half : i + half + 1])
        for i in range(half, len(ys) - half)
    }
    det = {i: period * ys[i] - trend[i] for i in trend}
    seas = {}
    for ph in range(period):
        vals = [d for i, d in det.items() if i % period == ph]
        if vals:
            s = sum(vals)
            seas[ph] = s // len(vals) if s >= 0 else -((-s) // len(vals))
            # python // floors; Spark div truncates toward zero
            q = int(s / len(vals))  # trunc
            seas[ph] = q
    for i in range(len(ys)):
        if i in trend:
            assert out[i]["trend_sum"] == trend[i]
            assert out[i]["detrended_s"] == det[i]
            assert out[i]["seasonal_s"] == seas[i % period]
            assert out[i]["residual_s"] == det[i] - seas[i % period]
        else:
            assert out[i]["trend_sum"] is None


# --------------------------------------------------------------------------
# Fano factor
# --------------------------------------------------------------------------

def test_fano_factor_matches_python_and_classifies(spark):
    rows = (
        [("const", v) for v in [5, 5, 5, 5]]          # fano 0
        + [("bursty", v) for v in [0, 0, 0, 40]]       # fano >> 1
        + [("zero", v) for v in [0, 0, 0]]             # undefined
    )
    df = spark.createDataFrame(rows, "g string, y long")
    out = {r["g"]: r for r in fano_factor(df, "g", F.col("y")).collect()}
    assert out["const"]["fano"] == 0.0
    assert out["zero"]["fano"] is None

    ys = [0, 0, 0, 40]
    n, s = len(ys), sum(ys)
    var_num = sum((y * n - s) ** 2 for y in ys)
    assert out["bursty"]["var_num"] == var_num
    expect = var_num / (n * n * s)  # == var/mean
    assert abs(out["bursty"]["fano"] - round(expect, 6)) < 1e-9
    # cross-check against the textbook definition
    m = s / n
    var = sum((y - m) ** 2 for y in ys) / n
    assert abs(expect - var / m) < 1e-9


# --------------------------------------------------------------------------
# modularity
# --------------------------------------------------------------------------

def _e(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def _l(spark, pairs):
    return spark.createDataFrame(pairs, "node long, label long")


def test_modularity_two_cliques_hand_value(spark):
    # two triangles joined by one bridge edge; the natural partition
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    labels = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)]
    out = modularity(_e(spark, edges), _l(spark, labels)).collect()[0]
    m = 7
    # community 1: in=3, deg=2+2+3=7 ; community 4: same by symmetry
    q_num = 2 * (4 * m * 3 - 7 * 7)
    assert (out["m"], out["n_communities"], out["q_num"]) == (7, 2, q_num)
    assert out["modularity"] == round(q_num / (4 * m * m), 6)


def test_modularity_single_community_is_zero(spark):
    # the whole graph in one community: Q = (4m*m - (2m)^2) / 4m^2 = 0
    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    labels = [(n, 1) for n in (1, 2, 3, 4)]
    out = modularity(_e(spark, edges), _l(spark, labels)).collect()[0]
    assert out["q_num"] == 0 and out["modularity"] == 0.0


def test_modularity_unlabeled_nodes_become_singletons(spark):
    # labels cover only node 1; partition must still be total, and
    # sum_c deg_c must equal 2m for q_num to be well-formed
    edges = [(1, 2), (2, 3)]
    out = modularity(_e(spark, edges), _l(spark, [(1, 1)])).collect()[0]
    m = 2
    # communities: {1}, {2}, {3}: in_c all 0; degs 1, 2, 1
    q_num = -(1 + 4 + 1)
    assert (out["n_communities"], out["q_num"]) == (3, q_num)
    assert out["modularity"] == round(q_num / (4 * m * m), 6)


# --------------------------------------------------------------------------
# registry-level laws (independent pandas references on real testdata)
# --------------------------------------------------------------------------

def test_loo_quality_delta_matches_pandas(spark):
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = {r["source"]: r for r in E.queries()["loo_quality_delta"](spark, sf).collect()}
    pdf = pd.read_parquet(f"{sf}/documents.parquet")[["source", "n_chars"]]
    N, S = len(pdf), int(pdf["n_chars"].sum())
    for src, grp in pdf.groupby("source"):
        n_i, s_i = len(grp), int(grp["n_chars"].sum())
        r = out[src]
        assert (r["n_i"], r["s_i"]) == (n_i, s_i)
        assert r["full_mean_micro"] == (S * 1_000_000) // N
        assert r["loo_mean_micro"] == ((S - s_i) * 1_000_000) // (N - n_i)
        # sign law: removing a below-average source raises the mean
        below_avg = s_i * N < S * n_i
        assert (r["delta_micro"] > 0) == below_avg or r["delta_micro"] == 0


def test_l_diversity_matches_pandas(spark):
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["l_diversity"](spark, sf).toPandas()
    pdf = pd.read_parquet(f"{sf}/events.parquet")[["ts", "user_id", "event_type"]]
    pdf["day"] = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%d")
    pdf["cohort"] = pdf["user_id"] % 50
    ref = (
        pdf.groupby(["day", "cohort"])["event_type"]
        .nunique()
        .reset_index(name="l_distinct")
        .sort_values(["day", "cohort"])
        .reset_index(drop=True)
    )
    got = out[["day", "cohort", "l_distinct"]].reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["l_distinct"].to_numpy() == ref["l_distinct"].to_numpy()).all()
    assert ((out["l_distinct"] < 3).astype(int).to_numpy() == out["at_risk"].to_numpy()).all()


# --------------------------------------------------------------------------
# batch 3: KMV intersection, Brier decomposition, pinball loss, hard negs
# --------------------------------------------------------------------------

def test_kmv_intersect_exact_below_k(spark):
    """When the union has < k distinct hashes the sketches ARE the hash
    sets, so every output must be exact set algebra."""
    from ingestion_scripts_spark.operators.sketches import (
        kmv_intersect,
        kmv_sketch,
    )

    rows_a = [("a", f"u{i}") for i in range(30)]          # u0..u29
    rows_b = [("b", f"u{i}") for i in range(20, 50)]       # u20..u49
    df = spark.createDataFrame(rows_a + rows_b, "g string, v string")
    sa = kmv_sketch(df.filter(F.col("g") == "a"), "g", F.col("v"), k=64)
    sb = kmv_sketch(df.filter(F.col("g") == "b"), "g", F.col("v"), k=64)
    out = kmv_intersect(sa, sb, k=64).collect()[0]
    # |A|=30, |B|=30, |A ∪ B|=50, |A ∩ B|=10
    assert (out["m_union"], out["matches"]) == (50, 10)
    assert out["jaccard_micro"] == (10 * 1_000_000) // 50
    assert (out["union_est"], out["inter_est"]) == (50, 10)


def test_kmv_intersect_estimates_track_truth_above_k(spark):
    from ingestion_scripts_spark.operators.sketches import (
        kmv_intersect,
        kmv_sketch,
    )

    rows_a = [("a", f"u{i}") for i in range(3000)]
    rows_b = [("b", f"u{i}") for i in range(1500, 4500)]
    df = spark.createDataFrame(rows_a + rows_b, "g string, v string")
    sa = kmv_sketch(df.filter(F.col("g") == "a"), "g", F.col("v"), k=64)
    sb = kmv_sketch(df.filter(F.col("g") == "b"), "g", F.col("v"), k=64)
    out = kmv_intersect(sa, sb, k=64).collect()[0]
    # truth: union 4500, intersection 1500, jaccard 1/3
    assert 0.5 * 4500 < out["union_est"] < 1.6 * 4500
    assert 0.10 < out["jaccard_micro"] / 1e6 < 0.65  # ~1/sqrt(64) noise
    assert 0 < out["inter_est"] < 2 * 1500 + 500


def test_brier_decomposition_identity_and_hand_case(spark):
    from ingestion_scripts_spark.operators.profiling import brier_decomposition

    # two bins: bin0 = p 0.1 with outcomes (0,0,1); bin9 = p 0.9 with (1,1)
    rows = [(100_000, 0), (100_000, 0), (100_000, 1), (900_000, 1), (900_000, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    out = brier_decomposition(df, F.col("s"), F.col("y") == 1, 10).collect()[0]
    n = 5
    brier_num = 2 * 100_000**2 + (100_000 - 1_000_000) ** 2 + 2 * (900_000 - 1_000_000) ** 2
    assert out["brier_num"] == brier_num
    # bin0: Sp=300000, So=1 -> (300000-1000000)^2 div 3 ; bin9: Sp=1800000,
    # So=2 -> (1800000-2000000)^2 div 2
    rel_num = (300_000 - 1_000_000) ** 2 // 3 + (1_800_000 - 2_000_000) ** 2 // 2
    assert out["rel_num"] == rel_num
    assert out["brier"] == round(brier_num / (n * 1e12), 6)
    # identity holds by construction: res - rel + brier == unc
    unc = out["so"] * (n - out["so"]) / n**2
    assert abs((out["resolution"] - out["reliability"] + out["brier"]) - round(unc, 6)) < 2e-6


def test_brier_perfect_and_worst_predictors(spark):
    from ingestion_scripts_spark.operators.profiling import brier_decomposition

    perfect = [(1_000_000, 1)] * 3 + [(0, 0)] * 3
    df = spark.createDataFrame(perfect, "s long, y int")
    out = brier_decomposition(df, F.col("s"), F.col("y") == 1, 10).collect()[0]
    assert out["brier"] == 0.0 and out["reliability"] == 0.0
    assert out["resolution"] == out["uncertainty"] == 0.25

    worst = [(0, 1)] * 2 + [(1_000_000, 0)] * 2
    df = spark.createDataFrame(worst, "s long, y int")
    out = brier_decomposition(df, F.col("s"), F.col("y") == 1, 10).collect()[0]
    assert out["brier"] == 1.0


def test_pinball_loss_order_statistic_is_minimizer(spark):
    """The defining property: the rank-ceil(q*n) order statistic minimizes
    pinball loss — perturbing the predictor by ±1 must not reduce the
    scaled loss sum (checked in pure Python against the kernel's yhat)."""
    import random

    from ingestion_scripts_spark.operators.profiling import pinball_loss

    rng = random.Random(17)
    ys = [rng.randint(0, 1000) for _ in range(41)]
    df = spark.createDataFrame([("g", y) for y in ys], "g string, y long")
    out = pinball_loss(df, "g", F.col("y"), q_num=9, q_den=10).collect()[0]

    def loss(yhat):
        return sum(9 * (y - yhat) if y >= yhat else (yhat - y) for y in ys)

    assert out["yhat"] == sorted(ys)[(9 * 41 + 9) // 10 - 1]
    assert out["loss_sum_scaled"] == loss(out["yhat"])
    assert loss(out["yhat"]) <= loss(out["yhat"] + 1)
    assert loss(out["yhat"]) <= loss(out["yhat"] - 1)
    assert out["mean_loss"] == round(out["loss_sum_scaled"] / (41 * 10.0), 6)


def test_hard_negatives_excludes_near_dups_and_ranks(spark):
    from ingestion_scripts_spark.operators.similarity import hard_negatives

    # query q; an exact duplicate (sim 1.0, must be excluded); a close
    # vector (sim ~0.94, excluded); a moderate one (~0.7, rank 1); an
    # orthogonal one (0.0, rank 2)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),          # exact dup
        (2, [0.94, 0.34, 0.0]),        # sim ~0.94
        (3, [0.7, 0.714, 0.0]),        # sim ~0.70
        (4, [0.0, 0.0, 1.0]),          # sim 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    out = hard_negatives(q, df, max_sim=0.9, k=3).orderBy("rank").collect()
    assert [r["match_id"] for r in out] == [3, 4]
    assert all(r["sim"] < 0.9 for r in out)
    assert out[0]["sim"] > 0.69


# --------------------------------------------------------------------------
# batch 4: novelty decay, Gini, negative sampling, streaming KMV
# --------------------------------------------------------------------------

def test_novelty_decay_matches_pandas(spark):
    import pandas as pd

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["novelty_decay"](spark, sf).toPandas()
    pdf = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    first = pdf.groupby("text")["doc_id"].min().rename("first_id")
    pdf = pdf.join(first, on="text")
    pdf["bucket"] = pdf["doc_id"] // 50
    pdf["novel"] = (pdf["doc_id"] == pdf["first_id"]).astype(int)
    ref = pdf.groupby("bucket").agg(n=("novel", "size"), novel=("novel", "sum"))
    for _, r in out.iterrows():
        e = ref.loc[r["bucket"]]
        assert (r["n"], r["novel"]) == (e["n"], e["novel"])
        assert r["novelty_micro"] == (e["novel"] * 1_000_000) // e["n"]
    # first bucket is always fully novel at its first occurrence rows;
    # total novel == number of distinct texts
    assert out["novel"].sum() == pdf["text"].nunique()


def test_gini_textbook_reference_and_bounds(spark):
    import random

    from ingestion_scripts_spark.operators import profiling  # noqa: F401

    # evaluate the identity itself in pure python on random data, then the
    # degenerate cases through the registered query's formula shape
    rng = random.Random(31)
    ys = sorted(rng.randint(1, 10_000) for _ in range(200))
    n, s = len(ys), sum(ys)
    g_num = 2 * sum((i + 1) * y for i, y in enumerate(ys)) - (n + 1) * s
    gini = g_num / (n * s)
    # textbook mean-absolute-difference form: G = sum|yi-yj| / (2 n^2 mu)
    mad = sum(abs(a - b) for a in ys for b in ys)
    assert abs(gini - mad / (2 * n * n * (s / n))) < 1e-9
    assert 0.0 <= gini < 1.0

    # all-equal values -> G == 0 through the same integer identity
    ys = [7] * 10
    n, s = 10, 70
    assert 2 * sum((i + 1) * 7 for i in range(10)) - 11 * 70 == 0


def test_negative_sampling_table_matches_python(spark):
    import math

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["negative_sampling_table"](spark, sf).toPandas()
    # weights reproduce floor(f^0.75 * 1e6 + 0.5); ranges partition [0, total)
    for _, r in out.iterrows():
        assert r["w_micro"] == math.floor(r["f"] ** 0.75 * 1e6 + 0.5)
    assert (out["w_micro"] > 0).all()
    # cumulative ranges are strictly increasing and consistent
    cums = out["cum_w"].tolist()
    ws = out["w_micro"].tolist()
    assert cums[0] == ws[0]
    for i in range(1, len(cums)):
        assert cums[i] == cums[i - 1] + ws[i]
    # smoothing flattens: weight ratios are milder than frequency ratios
    f0, fl = out["f"].iloc[0], out["f"].iloc[-1]
    if f0 > fl:
        assert out["w_micro"].iloc[0] / out["w_micro"].iloc[-1] < f0 / fl


def test_stream_kmv_equals_batch_kmv_bit_for_bit(spark):
    """THE law this operator exists for: KMV state is a pure min-set, so
    the 3-micro-batch streaming maintenance must produce the exact same
    sketch (and therefore estimates) as one batch pass — streaming/batch
    consistency with zero tolerance."""
    import __spark_entry__ as E
    from ingestion_scripts_spark.operators import sketches as SK
    from ingestion_scripts_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    streamed = {
        r["g"]: (r["m"], r["est"], r["kth_hash"])
        for r in E.queries()["stream_kmv_distinct"](spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    batch = {
        r["g"]: (r["m"], r["est"], r["kth_hash"])
        for r in SK.kmv_estimate(
            SK.kmv_sketch(ev, "event_type", F.col("user_id").cast("string"), 64),
            64,
        ).collect()
    }
    assert streamed == batch and len(batch) >= 3


# --------------------------------------------------------------------------
# batch 5: RBO, decile lift, conditional entropy
# --------------------------------------------------------------------------

def _ranking_df(spark, keys):
    return spark.createDataFrame(
        [(k, i + 1) for i, k in enumerate(keys)], "key string, rank long"
    )


def test_rbo_identical_disjoint_and_python_reference(spark):
    import random

    from ingestion_scripts_spark.operators.retrieval import (
        rbo_overlap,
        rbo_weights_pico,
    )

    keys = [f"k{i}" for i in range(50)]
    # identical rankings: overlap_d == d at every depth, so each term is
    # exactly W_d and rbo_pico == sum(W) (== 1 - p^50 scaled)
    out = rbo_overlap(_ranking_df(spark, keys), _ranking_df(spark, keys)).collect()[0]
    w = rbo_weights_pico(50, 0.9)
    assert out["rbo_pico"] == sum(w)
    assert out["n_common"] == 50
    assert abs(out["rbo"] - (1 - 0.9**50)) < 1e-4

    # disjoint rankings: zero everywhere
    other = [f"z{i}" for i in range(50)]
    out = rbo_overlap(_ranking_df(spark, keys), _ranking_df(spark, other)).collect()[0]
    assert (out["rbo_pico"], out["n_common"]) == (0, 0)

    # random permutation vs independent python reference (same integer law)
    rng = random.Random(23)
    perm = keys[:]
    rng.shuffle(perm)
    out = rbo_overlap(_ranking_df(spark, keys), _ranking_df(spark, perm)).collect()[0]
    pos_a = {k: i + 1 for i, k in enumerate(keys)}
    pos_b = {k: i + 1 for i, k in enumerate(perm)}
    expect = 0
    for d in range(1, 51):
        ov = sum(1 for k in keys if max(pos_a[k], pos_b[k]) <= d)
        expect += (w[d - 1] * ov) // d
    assert out["rbo_pico"] == expect


def test_rbo_top_weighted_sensitivity(spark):
    """Swapping ranks 1<->2 must hurt RBO more than swapping 49<->50 —
    the property RBO exists for and set-overlap metrics lack."""
    from ingestion_scripts_spark.operators.retrieval import rbo_overlap

    keys = [f"k{i}" for i in range(50)]
    top_swap = keys[:]
    top_swap[0], top_swap[1] = top_swap[1], top_swap[0]
    tail_swap = keys[:]
    tail_swap[48], tail_swap[49] = tail_swap[49], tail_swap[48]
    a = _ranking_df(spark, keys)
    r_top = rbo_overlap(a, _ranking_df(spark, top_swap)).collect()[0]["rbo_pico"]
    r_tail = rbo_overlap(a, _ranking_df(spark, tail_swap)).collect()[0]["rbo_pico"]
    assert r_top < r_tail


def test_decile_lift_hand_case_and_invariants(spark):
    from ingestion_scripts_spark.operators.profiling import decile_lift

    # 20 rows, scores descending = ids; positives = the top 4 scorers
    rows = [(100 - i, 1 if i < 4 else 0, i) for i in range(20)]
    df = spark.createDataFrame(rows, "s long, y int, id long")
    out = decile_lift(df, F.col("s"), F.col("y"), "id", 10).collect()
    assert [r["n_d"] for r in out] == [2] * 10  # exact equal buckets
    assert out[0]["pos_d"] == 2 and out[1]["pos_d"] == 2
    # top decile: cum 2/2 positives vs base 4/20 -> lift 5.0
    assert out[0]["lift_micro"] == (2 * 20 * 1_000_000) // (2 * 4)
    # the last row always reconciles to the global base rate: lift 1.0
    assert out[-1]["cum_n"] == 20 and out[-1]["cum_pos"] == 4
    assert out[-1]["lift_micro"] == 1_000_000
    # cumulative counts are monotone
    cn = [r["cum_n"] for r in out]
    assert cn == sorted(cn)


def test_conditional_entropy_uniform_and_deterministic(spark):
    import math

    from ingestion_scripts_spark.operators.profiling import conditional_entropy

    rows = (
        [("u", t) for t in ("a", "b", "c", "d")] * 3  # uniform over 4: ln 4
        + [("v", "a")] * 7                            # deterministic: 0
    )
    df = spark.createDataFrame(rows, "prev string, nxt string")
    out = {r["prev"]: r for r in conditional_entropy(df, "prev", "nxt").collect()}
    assert out["v"]["h_nano"] == 0 and out["v"]["n_successors"] == 1
    # each of the 4 terms snaps independently: term = floor(.25*ln4*1e9+.5)
    term = math.floor(0.25 * math.log(4) * 1e9 + 0.5)
    assert out["u"]["h_nano"] == 4 * term
    assert out["u"]["n_u"] == 12
