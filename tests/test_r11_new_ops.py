"""r11 operator laws — each new operator verified against an INDEPENDENT
pure-Python / closed-form reference (never the DuckDB oracle SQL), per
the standing differential-blind-spot discipline."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestion_scripts_spark.operators.domains import (
    domain_dedup,
    domain_dedup_stats,
    registrable_domain,
)
from ingestion_scripts_spark.operators.histstats import (
    median_mad_gini_from_counts,
    value_counts,
)
from ingestion_scripts_spark.operators.ivm import incremental_merge
from ingestion_scripts_spark.operators.ranking import global_cumsum
from ingestion_scripts_spark.operators.spans import (
    longest_shared_span,
    shared_span_pairs,
)


# --------------------------------------------------------------------------
# global_cumsum: bit-equality vs the naive single-partition running sum
# --------------------------------------------------------------------------

def test_global_cumsum_matches_naive_window(spark):
    random.seed(11)
    rows = [(random.randint(-5, 5), random.randint(0, 100), i) for i in range(500)]
    df = spark.createDataFrame(rows, "grp long, v long, id long")
    got = {
        r.id: int(r.cum)
        for r in global_cumsum(
            df, [F.asc("v"), F.asc("id")], "grp", "cum", num_partitions=7
        ).collect()
    }
    naive = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.w
        for r in df.withColumn("w", F.sum("grp").over(naive)).collect()
    }
    assert got == want  # inclusive prefix sums, negatives included, exact


def test_global_cumsum_reserved_name_guard(spark):
    df = spark.createDataFrame([(1, 2)], "cum long, v long")
    with pytest.raises(ValueError, match="reserved"):
        global_cumsum(df, [F.asc("v")], "v", "cum")


# --------------------------------------------------------------------------
# histogram median/MAD/Gini: pure-Python closed form over the multiset
# --------------------------------------------------------------------------

def _ref_stats(xs):
    s = sorted(xs)
    n = len(xs)
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    med2 = s[k1 - 1] + s[k2 - 1]
    devs2 = sorted(abs(2 * x - med2) for x in xs)
    d4 = devs2[k1 - 1] + devs2[k2 - 1]
    tot = sum(xs)
    srank = sum((i + 1) * x for i, x in enumerate(s))
    gini = ((2 * srank - (n + 1) * tot) * 1_000_000) // (n * tot)
    return (
        n,
        tot,
        med2 * 1_000_000 // 2,
        d4 * 1_000_000 // 4,
        gini,
    )


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 60), min_size=1, max_size=60))
def test_histstats_property(spark, xs):
    if sum(xs) == 0:
        xs = xs + [1]  # documented contract: n·total > 0
    df = spark.createDataFrame([(v, i) for i, v in enumerate(xs)], "v long, id long")
    row = median_mad_gini_from_counts(value_counts(df, "v"), "v").collect()[0]
    got = (row["n"], row["total"], row["median_micro"], row["mad_micro"],
           row["gini_ppm"])
    assert got == _ref_stats(xs)


def test_histstats_ivm_law(spark):
    """Maintained histogram ≡ recompute histogram, and therefore the
    stats agree — the incremental contract end-to-end."""
    random.seed(23)
    base = [(random.randint(1, 40), i) for i in range(300)]
    ins = [(random.randint(1, 40), 1000 + i) for i in range(80)]
    dele = [r for r in base if r[1] % 7 == 0]
    mk = lambda rows: spark.createDataFrame(rows, "v long, id long")  # noqa: E731
    view = incremental_merge(
        value_counts(mk(base), "v"),
        value_counts(mk(ins), "v"),
        value_counts(mk(dele), "v"),
        keys=["v"],
        count_col="cnt",
        measures=[],
    )
    eff = [r for r in base if r[1] % 7 != 0] + ins
    recompute = value_counts(mk(eff), "v")
    assert sorted(map(tuple, view.collect())) == sorted(
        map(tuple, recompute.collect())
    )
    got = median_mad_gini_from_counts(view, "v").collect()[0]
    assert (
        got["n"], got["total"], got["median_micro"], got["mad_micro"],
        got["gini_ppm"],
    ) == _ref_stats([v for v, _ in eff])


def test_histstats_reserved_name_guard(spark):
    df = spark.createDataFrame([(1, 2)], "cum long, cnt long")
    with pytest.raises(ValueError, match="reserved"):
        median_mad_gini_from_counts(df, "cum", "cnt")


# --------------------------------------------------------------------------
# longest shared span: O(n·m) token-LCS dynamic program as the reference
# --------------------------------------------------------------------------

def _lcs_tokens(a: str, b: str) -> int:
    ta, tb = a.lower().split(), b.lower().split()
    best = 0
    dp = [0] * (len(tb) + 1)
    for i in range(1, len(ta) + 1):
        prev = 0
        for j in range(1, len(tb) + 1):
            cur = dp[j]
            dp[j] = prev + 1 if ta[i - 1] == tb[j - 1] else 0
            best = max(best, dp[j])
            prev = cur
    return best


def _rand_docs(seed, n_docs=24, vocab=10):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    docs = [
        (d, " ".join(rng.choice(words) for _ in range(rng.randint(4, 50))))
        for d in range(n_docs)
    ]
    # guaranteed heavy copy pair
    core = [rng.choice(words) for _ in range(30)]
    docs.append((100, " ".join(core)))
    docs.append(
        (101, " ".join(core[:18] + [rng.choice(words) for _ in range(8)]))
    )
    return docs


@pytest.mark.parametrize("seed,k", [(1, 3), (2, 4), (5, 5)])
def test_longest_shared_span_law(spark, seed, k):
    docs = _rand_docs(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = shared_span_pairs(df, k=k, max_docs_per_span=30)
    out = {
        (r.id1, r.id2): r.lss_tokens
        for r in longest_shared_span(df, pairs, k=k).collect()
    }
    txt = dict(docs)
    assert (100, 101) in out
    for (i, j), v in out.items():
        ref = _lcs_tokens(txt[i], txt[j])
        assert v == (ref if ref >= k else 0), (i, j, v, ref)


def test_shared_span_pairs_candidate_law(spark):
    """Candidate set = exactly the pairs sharing ≥1 rare k-span (brute
    force over the posting lists); the frequency cap drops only spans
    shared by > max_docs_per_span documents."""
    docs = _rand_docs(9, n_docs=18, vocab=6)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, cap = 3, 4
    got = {(r.id1, r.id2) for r in
           shared_span_pairs(df, k=k, max_docs_per_span=cap).collect()}
    posting = {}
    for d, text in docs:
        toks = text.lower().split()
        for i in range(len(toks) - k + 1):
            posting.setdefault(" ".join(toks[i : i + k]), set()).add(d)
    want = set()
    for ids in posting.values():
        if 2 <= len(ids) <= cap:
            ids = sorted(ids)
            want.update(
                (a, b) for ai, a in enumerate(ids) for b in ids[ai + 1 :]
            )
    assert got == want


# --------------------------------------------------------------------------
# registrable domain / URL dedup laws
# --------------------------------------------------------------------------

def test_registrable_domain_cases(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("news.blog.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("a.b.c.d.com.au", "d.com.au"),
        ("sub.site.org", "site.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.d for r in df.select(
            registrable_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_domain_dedup_survivor_law(spark):
    """One survivor per canonical URL: highest size, then lowest id —
    verified against a pure-Python groupby over the same canon rules."""
    rows = [
        (1, 10, "HTTP://WWW.Ex.COM/a?id=1&utm_source=x#f"),
        (2, 30, "http://www.ex.com/a/?id=1"),
        (3, 30, "http://www.ex.com/a?utm_c=z&id=1"),
        (4, 5, "http://ex.com/a?id=1"),  # different host -> different canon
        (5, 7, "http://news.site.co.uk/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sz long, url string")
    out = domain_dedup(df, "url", prefer_desc=["sz"], tiebreak_asc=["doc_id"])
    got = {(r.canon, r.doc_id) for r in out.collect()}
    assert got == {
        ("https://www.ex.com/a?id=1", 2),  # beats 1 (size) and 3 (doc_id)
        ("https://ex.com/a?id=1", 4),
        ("https://news.site.co.uk/b", 5),
    }
    doms = {r.doc_id: r.domain for r in out.collect()}
    assert doms == {2: "ex.com", 4: "ex.com", 5: "site.co.uk"}


def test_domain_dedup_stats_ppm(spark):
    rows = [
        (1, 10, "http://a.ex.com/x?id=1"),
        (2, 20, "http://a.ex.com/x?id=1&utm_s=1"),  # dup of 1
        (3, 30, "http://b.ex.com/y"),
        (4, 40, "http://c.other.org/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sz long, url string")
    out = {
        r.domain: (r.n_urls, r.n_canonical, r.dup_ppm, r.kept_size)
        for r in domain_dedup_stats(
            df, "url", ["sz"], ["doc_id"], "sz"
        ).collect()
    }
    assert out == {
        "ex.com": (3, 2, 333333, 50),  # survivor of the dup pair is sz=20
        "other.org": (1, 1, 0, 40),
    }


def test_domain_dedup_reserved_name_guard(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "canon long, url string")
    with pytest.raises(ValueError, match="reserved"):
        domain_dedup(df, "url", ["canon"], [])
