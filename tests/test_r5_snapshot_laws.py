"""Law/property tests for the r5 snapshot-commit operators that landed
with zero unit coverage (r5 VERDICT item 4): Fellegi-Sunter linkage
(`operators/linkage.py`), token-bucket rate limiting
(`operators/ratelimit.py` + `streams.token_bucket_admit`), Cohen's kappa
and calibration bins (`operators/profiling.py`), and integer HITS
(`operators/graph.py::hits_int`). Style model: tests/test_cc_star.py —
pin the LAW (candidate volume, probability bounds, burst ceiling,
normalization) with an independent pure-Python reference, not a golden
snapshot."""

import math
import random

from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import profiling as PR
from ingestion_scripts_spark.operators.graph import hits_int
from ingestion_scripts_spark.operators.linkage import (
    fs_field_weight,
    sorted_neighborhood_pairs,
    u_probability,
)
from ingestion_scripts_spark.operators.ratelimit import token_bucket_replay


# --------------------------------------------------------------------------
# linkage — sorted-neighborhood candidates + Fellegi-Sunter pieces
# --------------------------------------------------------------------------

def _snm_expected_pairs(block_sizes, window):
    """Independent count: within one block of size s, record at rank i
    (1-based) pairs forward with min(window, s - i) neighbors."""
    return sum(
        min(window, s - i) for s in block_sizes for i in range(1, s + 1)
    )


def test_snm_candidate_volume_is_linear_and_skew_independent(spark):
    # one giant block + many singletons: candidate count must follow the
    # linear formula, NOT the quadratic block-join count
    rows = [(i, "big", f"n{i:03d}") for i in range(40)]
    rows += [(100 + i, f"solo{i}", "x") for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, blk string, name string")
    pairs = sorted_neighborhood_pairs(df, "id", "blk", ["name"], window=3)
    got = pairs.count()
    assert got == _snm_expected_pairs([40] + [1] * 10, 3)
    # well-formed: forward-only distinct ids, same block both sides
    bad = pairs.filter(
        (F.col("id_a") == F.col("id_b")) | (F.col("blk_a") != F.col("blk_b"))
    ).count()
    assert bad == 0


def test_u_probability_exact_ratio_and_bounds(spark):
    # values [x, x, y]: sum n_v(n_v-1) = 2, N(N-1) = 6 -> u = 1/3
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    u = u_probability(df, "v", "u_v").collect()[0].u_v
    assert abs(u - 1.0 / 3.0) < 1e-12
    # all-distinct -> 0; all-equal -> 1 (the open-interval ends only occur
    # in these degenerate inputs; real fields land strictly inside)
    dis = spark.createDataFrame([(str(i),) for i in range(5)], "v string")
    assert u_probability(dis, "v", "u").collect()[0].u == 0.0
    same = spark.createDataFrame([("a",)] * 4, "v string")
    assert u_probability(same, "v", "u").collect()[0].u == 1.0


def test_fs_field_weight_agreement_and_disagreement(spark):
    m, u = 0.9, 0.1
    row = (
        spark.range(1)
        .select(
            fs_field_weight(F.lit(True), m, F.lit(u)).alias("wa"),
            fs_field_weight(F.lit(False), m, F.lit(u)).alias("wd"),
        )
        .collect()[0]
    )
    assert abs(row.wa - math.log2(m / u)) < 1e-9
    assert abs(row.wd - math.log2((1 - m) / (1 - u))) < 1e-9
    assert row.wa > 0 > row.wd  # agreement rewards, disagreement penalizes


# --------------------------------------------------------------------------
# token bucket — batch replay vs pure-Python reference; burst ceiling
# --------------------------------------------------------------------------

def _py_bucket(times, cap, cost, rate, per_s):
    tokens, prev, adm = cap, None, 0
    for es in sorted(times):
        if prev is not None:
            tokens = min(cap, tokens + ((es - prev) * rate) // per_s)
        prev = es
        if tokens >= cost:
            tokens -= cost
            adm += 1
    return adm, tokens


def test_token_bucket_replay_matches_reference_and_burst_ceiling(spark):
    rng = random.Random(7)
    rows = []
    per_key = {}
    for k in range(6):
        ts = sorted(rng.randrange(0, 4000) for _ in range(rng.randrange(1, 40)))
        per_key[k] = ts
        rows += [(k, t, i) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "user_id bigint, es bigint, seq bigint")
    out = {
        r.user_id: r
        for r in token_bucket_replay(
            df, "user_id", "es", "seq", cap_mt=3000, cost_mt=1000,
            rate_mt=1000, per_s=600,
        ).collect()
    }
    for k, ts in per_key.items():
        adm, end = _py_bucket(ts, 3000, 1000, 1000, 600)
        assert out[k].n_events == len(ts)
        assert out[k].n_admitted == adm
        assert out[k].tokens_end_mt == end
        assert 0 <= out[k].tokens_end_mt <= 3000
        # burst ceiling: admissions never exceed initial burst + refills
        span = ts[-1] - ts[0] if ts else 0
        assert out[k].n_admitted <= 3 + (span * 1000) // (600 * 1000) + 1


def test_stream_token_bucket_final_state_equals_batch_replay(spark, tmp_path):
    """The streaming operator's per-key FINAL emission across a 2-batch
    time-split replay must equal the one-shot batch replay (the law
    q_stream_token_bucket certifies against the recursive-CTE oracle)."""
    import glob
    import os
    import time

    from ingestion_scripts_spark.streaming.streams import token_bucket_admit

    rng = random.Random(11)
    rows = [
        (k, t, i)
        for k in range(4)
        for i, t in enumerate(sorted(rng.randrange(0, 2000) for _ in range(12)))
    ]
    df = spark.createDataFrame(rows, "user_id bigint, es bigint, seq bigint")
    src = str(tmp_path / "src")
    df.filter("es < 1000").coalesce(1).write.parquet(f"{src}/b0")
    df.filter("es >= 1000").coalesce(1).write.parquet(f"{src}/b1")
    now = time.time()
    for i, d in enumerate(("b0", "b1")):
        for p in glob.glob(f"{src}/{d}/*.parquet"):
            os.utime(p, (now - 100 + 40 * i, now - 100 + 40 * i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = token_bucket_admit(
        stream, "user_id", "es", "seq", cap_mt=3000, cost_mt=1000,
        rate_mt=1000, per_s=300,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("tb_law")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = {
        r.user_id: r
        for r in spark.table("tb_law")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("n_admitted", "n_events").alias("n_admitted"),
            F.max_by("tokens_end_mt", "n_events").alias("tokens_end_mt"),
        )
        .collect()
    }
    batch = {
        r.user_id: r
        for r in token_bucket_replay(
            df, "user_id", "es", "seq", cap_mt=3000, cost_mt=1000,
            rate_mt=1000, per_s=300,
        ).collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k].n_events == batch[k].n_events
        assert final[k].n_admitted == batch[k].n_admitted
        assert final[k].tokens_end_mt == batch[k].tokens_end_mt


# --------------------------------------------------------------------------
# cohens_kappa — edge cases the r5 ADVICE flagged
# --------------------------------------------------------------------------

def test_kappa_perfect_agreement(spark):
    df = spark.createDataFrame(
        [(True, True), (False, False), (True, True), (False, False)],
        "a boolean, b boolean",
    )
    row = PR.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert row.po == 1.0 and row.kappa == 1.0


def test_kappa_null_when_pe_is_one(spark):
    # both raters constant-true -> pe = 1 -> kappa undefined -> NULL
    df = spark.createDataFrame([(True, True)] * 5, "a boolean, b boolean")
    row = PR.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    assert row.pe == 1.0 and row.kappa is None


def test_kappa_null_raters_count_as_false(spark):
    df_null = spark.createDataFrame(
        [(None, True), (True, True), (False, False)], "a boolean, b boolean"
    )
    df_false = spark.createDataFrame(
        [(False, True), (True, True), (False, False)], "a boolean, b boolean"
    )
    got = PR.cohens_kappa(df_null, F.col("a"), F.col("b")).collect()[0]
    want = PR.cohens_kappa(df_false, F.col("a"), F.col("b")).collect()[0]
    assert (got.n, got.n_a, got.n_b, got.n_agree) == (
        want.n, want.n_a, want.n_b, want.n_agree,
    )
    assert got.kappa == want.kappa


# --------------------------------------------------------------------------
# calibration_bins — mass conservation + the gap/ECE identities
# --------------------------------------------------------------------------

def test_calibration_bins_mass_and_identities(spark):
    rng = random.Random(3)
    rows = [
        (rng.randrange(0, 1_000_001), rng.random() < 0.4) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    out = PR.calibration_bins(df, F.col("s"), F.col("y"), n_bins=10).collect()
    assert sum(r.n for r in out) == 500
    for r in out:
        assert 0 <= r.bin <= 9
        assert r.gap_u == abs(r.mean_score_u - r.pos_rate_u)
        assert r.ece_num == r.n * r.gap_u
        assert 0 <= r.pos_rate_u <= 1_000_000


def test_calibration_perfectly_calibrated_bin(spark):
    # one bin, score exactly 500000, half positives -> gap 0
    rows = [(500_000, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    out = PR.calibration_bins(df, F.col("s"), F.col("y"), n_bins=10).collect()
    assert len(out) == 1 and out[0].bin == 5 and out[0].gap_u == 0


# --------------------------------------------------------------------------
# hits_int — normalization + known tiny graph
# --------------------------------------------------------------------------

def test_hits_normalization_and_star_graph(spark):
    # a -> c, b -> c (equal weight): c is the sole authority, a and b are
    # equal hubs; every score stays in [0, 1e6] and each round's max hits
    # exactly 1e6 by the rescale law
    edges = spark.createDataFrame(
        [(1, 3, 1), (2, 3, 1)], "src bigint, dst bigint, w bigint"
    )
    out = {r.node: r for r in hits_int(edges, "src", "dst", "w", iters=3).collect()}
    assert out[3].auth_u == 1_000_000 and out[3].hub_u == 0
    assert out[1].hub_u == out[2].hub_u == 1_000_000
    assert out[1].auth_u == out[2].auth_u == 0
    for r in out.values():
        assert 0 <= r.hub_u <= 1_000_000 and 0 <= r.auth_u <= 1_000_000
