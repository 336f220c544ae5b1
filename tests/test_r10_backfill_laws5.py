"""Law-test backfill, batch 5: token_budget_mix (python prefix-sum walk
+ budget law), phrase_search (python trigram index), benford_profile
(python first-digit histogram), pagerank_int (python replication of the
integer rounds + symmetry closed forms). Pure-Python references, never
the oracle SQL."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from ingestion_scripts_spark.registry.part04 import (
    _TOKEN_BUDGET_DEFAULT,
    _TOKEN_BUDGETS,
)

SF = "/root/testdata/sf0.001"


def _docs(cols):
    t = pq.read_table(f"{SF}/documents.parquet", columns=cols)
    return list(zip(*[t.column(c).to_pylist() for c in cols]))


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _toks(text: str):
    return [w for w in text.lower().split(" ") if w]


# ----------------------------------------------------------- token_budget_mix


def test_token_budget_mix_matches_python_walk(spark):
    got = {
        (r.source, r.doc_id): (r.ntok, r.cum_before)
        for r in E.queries()["token_budget_mix"](spark, SF).collect()
    }
    per_src = defaultdict(list)
    for did, src, text in _docs(["doc_id", "source", "text"]):
        per_src[src].append((_h64(f"{src}|{did}"), did, len(_toks(text))))
    exp = {}
    for src, rows in per_src.items():
        budget = _TOKEN_BUDGETS.get(src, _TOKEN_BUDGET_DEFAULT)
        cum = 0
        for _, did, ntok in sorted(rows):
            if cum < budget:
                exp[(src, did)] = (ntok, cum)
            cum += ntok
    assert got == exp
    # budget law: every taken doc started strictly under its budget
    for (src, _), (_, cb) in got.items():
        assert cb < _TOKEN_BUDGETS.get(src, _TOKEN_BUDGET_DEFAULT)


# --------------------------------------------------------------- phrase_search


def test_phrase_search_matches_python_index(spark):
    got = {
        (r.phrase, r.doc_id): r.n_hits
        for r in E.queries()["phrase_search"](spark, SF).collect()
    }
    counts = defaultdict(int)
    per_doc = {}
    for did, text in _docs(["doc_id", "text"]):
        ts = _toks(text)
        grams = [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
        per_doc[did] = grams
        for g in grams:
            counts[g] += 1
    top2 = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:2]
    exp = {}
    for g, _ in top2:
        for did, grams in per_doc.items():
            n = grams.count(g)
            if n:
                exp[(g, did)] = n
    assert got == exp


# ------------------------------------------------------------- benford_profile


def test_benford_profile_matches_python_histogram(spark):
    got = {
        r.digit: (r.n, r.observed_share, r.benford_share, r.chi2_part)
        for r in E.queries()["benford_profile"](spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/events.parquet", columns=["value"])
    digits = defaultdict(int)
    for v in t.column("value").to_pylist():
        v = float(v)
        if v > 0:
            digits[str(math.floor(v * 100 + 0.5))[0]] += 1
    total = sum(digits.values())
    assert {d: got[d][0] for d in got} == dict(digits)
    for d, n in digits.items():
        obs = n / total
        ben = math.log10(1 + 1 / int(d))
        assert got[d][1] == pytest.approx(obs, abs=1e-3), d
        assert got[d][2] == pytest.approx(ben, abs=1e-3), d
        assert got[d][3] == pytest.approx((obs - ben) ** 2 / ben, abs=1e-3), d


# ---------------------------------------------------------------- pagerank_int


def _pagerank_py(edges, iters=3):
    """edges: [(src, dst, w)] — replicate pagerank_int's integer rounds."""
    out_w = defaultdict(int)
    nodes = set()
    for s, d, w in edges:
        out_w[s] += w
        nodes.update((s, d))
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for s, d, w in edges:
            contrib[d] += (r[s] * w) // out_w[s]
        r = {n: 150_000 + (85 * contrib.get(n, 0)) // 100 for n in nodes}
    return r


def test_pagerank_int_matches_python_rounds(spark):
    from ingestion_scripts_spark.operators.graph import pagerank_int

    edges = [
        ("a", "b", 3), ("b", "c", 1), ("c", "a", 2),
        ("a", "c", 1), ("d", "a", 5),
    ]
    df = spark.createDataFrame(edges, "s string, d string, w long")
    got = {
        r.node: r.pr_u
        for r in pagerank_int(df, "s", "d", "w", iters=3).collect()
    }
    assert got == _pagerank_py(edges)


def test_pagerank_int_symmetric_cycle_is_uniform(spark):
    from ingestion_scripts_spark.operators.graph import pagerank_int

    df = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "s string, d string, w long"
    )
    got = {r.node: r.pr_u for r in pagerank_int(df, "s", "d", "w").collect()}
    assert len(set(got.values())) == 1  # perfect symmetry -> equal ranks


def test_pagerank_transitions_query_is_consistent(spark):
    rows = E.queries()["pagerank_transitions"](spark, SF).collect()
    assert all(r.pr_u >= 150_000 for r in rows)  # the damping floor
    prs = [r.pr_u for r in rows]
    assert prs == sorted(prs, reverse=True)  # contract: ordered desc
