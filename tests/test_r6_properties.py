"""Property-based tests for the r6 operators (style: tests/test_properties.py
— Hypothesis generates inputs, a literal pure-Python reimplementation is
the oracle). These cover the kernels whose laws have interesting input
spaces: average precision, nDCG, greedy k-center, greedy max-coverage,
and the single-pass token-bucket replay (whose mapInPandas carry-state
across Arrow batches is exactly the kind of logic a fixed example can
miss)."""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.clustering import kcenter_greedy
from ingestion_scripts_spark.operators.profiling import (
    average_precision,
    ndcg_at_k,
    ndcg_discounts_micro,
)
from ingestion_scripts_spark.operators.ratelimit import token_bucket_replay
from ingestion_scripts_spark.operators.text_analysis import max_coverage_select

# small-cardinality strategies: each Spark round-trip costs ~1s, so examples
# stay few but adversarial (ties, duplicates, single-element groups)
LABELS = st.lists(st.booleans(), min_size=1, max_size=12)
SCORES = st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=12)


def ref_average_precision(pairs):
    """(score, label, id) -> micro-floored AP, the operator's documented
    law restated in plain Python."""
    ranked = sorted(pairs, key=lambda p: (-p[0], p[2]))
    n_pos = sum(1 for p in ranked if p[1])
    if n_pos == 0:
        return None
    cum = 0
    acc = 0
    for i, p in enumerate(ranked, start=1):
        if p[1]:
            cum += 1
            acc += (cum * 1_000_000) // i
    return math.floor(acc / n_pos + 0.5) / 1_000_000


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.booleans()), min_size=1, max_size=12))
def test_average_precision_matches_reference(spark, rows):
    pairs = [(s, y, i) for i, (s, y) in enumerate(rows)]
    df = spark.createDataFrame(
        [("g", s, y, i) for (s, y, i) in pairs],
        "g string, s bigint, y boolean, id bigint",
    )
    got = average_precision(df, "g", F.col("s"), F.col("y"), "id").collect()[0]["ap"]
    assert got == ref_average_precision(pairs)


def ref_ndcg(pairs, k=10):
    disc = ndcg_discounts_micro(k)
    pred = sorted(pairs, key=lambda p: (-p[0], p[2]))
    ideal = sorted(pairs, key=lambda p: (-p[1], p[2]))
    dcg = sum(p[1] * disc[i] for i, p in enumerate(pred[:k]))
    idcg = sum(p[1] * disc[i] for i, p in enumerate(ideal[:k]))
    if idcg == 0:
        return None
    return math.floor(dcg * 1_000_000 / idcg + 0.5) / 1_000_000


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=14))
def test_ndcg_matches_reference(spark, rows):
    pairs = [(s, r, i) for i, (s, r) in enumerate(rows)]
    df = spark.createDataFrame(
        [("g", s, r, i) for (s, r, i) in pairs],
        "g string, s bigint, rel bigint, id bigint",
    )
    got = ndcg_at_k(df, "g", F.col("s"), F.col("rel"), "id", k=10).collect()[0]["ndcg"]
    assert got == ref_ndcg(pairs)


def ref_kcenter(points, k):
    """points: list of (id, [floats]). Returns [(rank, id, dist_sq_mu)]."""
    q = {
        pid: [math.floor(x * 1_000_000 + 0.5) for x in vec] for pid, vec in points
    }
    seed = min(q)
    picked = [(1, seed, 0)]
    centers = [q[seed]]
    dmin = {
        pid: min(sum((a - b) ** 2 for a, b in zip(v, c)) for c in centers)
        for pid, v in q.items()
    }
    for rank in range(2, k + 1):
        far = max(q, key=lambda pid: (dmin[pid], -pid))
        # tie -> smallest id: max over (d, -id)
        picked.append((rank, far, dmin[far]))
        centers.append(q[far])
        for pid, v in q.items():
            d = sum((a - b) ** 2 for a, b in zip(v, q[far]))
            dmin[pid] = min(dmin[pid], d)
    return picked


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=4,
        max_size=10,
        unique_by=tuple,
    )
)
def test_kcenter_matches_reference(spark, vecs):
    points = list(enumerate(vecs))
    df = spark.createDataFrame(
        [(pid, v) for pid, v in points], "vec_id bigint, embedding array<double>"
    )
    k = min(4, len(points))
    got = [
        (r["rank"], r["center_id"], r["picked_dist_sq"])
        for r in kcenter_greedy(df, "embedding", "vec_id", k=k).orderBy("rank").collect()
    ]
    assert got == ref_kcenter(points, k)


def ref_max_coverage(docs, k):
    covered: set = set()
    picked = []
    remaining = dict(docs)
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = min(
            remaining,
            key=lambda d: (-len(set(remaining[d]) - covered), d),
        )
        gain = len(set(remaining[best]) - covered)
        picked.append((rank, best, gain))
        covered |= set(remaining.pop(best))
    return picked


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), max_size=6),
        min_size=1,
        max_size=8,
    )
)
def test_max_coverage_matches_reference(spark, toksets):
    docs = [(i, t) for i, t in enumerate(toksets)]
    df = spark.createDataFrame(docs, "doc_id bigint, t array<string>")
    k = min(3, len(docs))
    got = [
        (r["rank"], r["doc_id"], r["gain"])
        for r in max_coverage_select(df, "doc_id", "t", k=k).orderBy("rank").collect()
    ]
    assert got == ref_max_coverage(docs, k)


def ref_token_bucket(events, cap=3000, cost=1000, rate=1000, per_s=60):
    """events: (key, es, seq). Returns {key: (n, admitted, tokens)}."""
    out = {}
    from collections import defaultdict

    hist = defaultdict(list)
    for k, es, seq in events:
        hist[k].append((es, seq))
    for k, rows in hist.items():
        rows.sort()
        tokens, prev, adm = cap, None, 0
        for es, _ in rows:
            if prev is not None:
                tokens = min(cap, tokens + ((es - prev) * rate) // per_s)
            prev = es
            if tokens >= cost:
                tokens -= cost
                adm += 1
        out[k] = (len(rows), adm, tokens)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # key — few keys, so histories collide
            st.integers(0, 500),        # epoch seconds
        ),
        min_size=1,
        max_size=40,
    )
)
def test_token_bucket_replay_matches_reference(spark, rows):
    events = [(k, es, i) for i, (k, es) in enumerate(rows)]
    df = spark.createDataFrame(events, "user_id bigint, es bigint, event_id bigint")
    got = {
        r["user_id"]: (r["n_events"], r["n_admitted"], r["tokens_end_mt"])
        for r in token_bucket_replay(df, "user_id", "es", "event_id").collect()
    }
    assert got == ref_token_bucket(events)
