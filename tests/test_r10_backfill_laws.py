"""Law/property backfill for the pre-r6 registry block (VERDICT r9 item 1).

The r1–r4 third of the registry was protected only by the DuckDB
differential oracle, which is structurally blind to shared-shape bugs —
all four differential-blind catches (k-core rounds, isotonic gaps, fano
denominator, W1 degenerate groups) surfaced only once operators gained
an INDEPENDENT check. This file gives each named pre-r6 query a
pure-Python / closed-form reference derived from the textbook (or the
reference repo's Python semantics, ``src/reddit_consumer.py:58-88``,
``src/twitter_consumer.py:100-103``), NOT from the oracle SQL:

- value_percentiles   — linear-interpolated quantile vs sorted-list math
- pivot_weekday       — calendar weekday counts vs datetime.weekday()
- running_user_value  — running sum / 3-row mavg / rank vs a Python scan
- user_value_quartiles— ntile(4) vs the floor/ceil bucket-size law
- window_dist_funcs   — percent_rank=(rank-1)/(n-1), cume_dist=|{<=}|/n
- sessionize          — gaps-and-islands vs a Python sessionizer,
                        including the exact-1800s boundary law
- asof_clicks / asof_join — latest right <= left per key vs a Python
                        as-of, tie and no-match laws, Hypothesis sweep
- pipeline text stages — clean_text / hashtags / stopword filter /
                        canonical bigrams vs Python ``re`` twins (ASCII
                        ``\\w``, matching Java/RE2 semantics)

End-to-end laws read the same sf0.001 parquet the query reads (via
pyarrow, no SQL engine) and recompute the expected frame in pure Python.
"""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import defaultdict

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _events_py():
    """events table as python dicts; ts as naive-UTC datetime."""
    t = pq.read_table(f"{SF}/events.parquet")
    cols = t.column_names
    rows = [dict(zip(cols, r)) for r in zip(*[t.column(c).to_pylist() for c in cols])]
    for r in rows:
        ts = r["ts"]
        if isinstance(ts, int):  # TIMESTAMP(NANOS) read as ns int
            r["ts"] = dt.datetime(1970, 1, 1) + dt.timedelta(
                microseconds=ts // 1000
            )
        elif getattr(ts, "tzinfo", None) is not None:
            r["ts"] = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return rows


def _interp_quantile(sorted_vals: list[float], p: float) -> float:
    """Textbook linear-interpolated (type-7) quantile — what both Spark
    ``percentile`` and numpy's default compute: pos = p*(n-1)."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = math.floor(pos)
    hi = math.ceil(pos)
    frac = pos - lo
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


# ------------------------------------------------------- value_percentiles

def test_value_percentiles_matches_sorted_list_interpolation(spark):
    got = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in E.queries()["value_percentiles"](spark, SF).collect()
    }
    by_type = defaultdict(list)
    for r in _events_py():
        if r["value"] is not None:
            by_type[r["event_type"]].append(float(r["value"]))
    assert set(got) == set(by_type)
    for et, vals in by_type.items():
        vals.sort()
        for i, p in enumerate((0.5, 0.9, 0.99)):
            assert got[et][i] == pytest.approx(
                round(_interp_quantile(vals, p), 4), abs=1e-4
            ), (et, p)


def test_interpolated_quantile_closed_form_tiny(spark):
    # p50 of [1, 3] interpolates to 2.0; p90 of [0, 10] = 9.0 — exact law
    df = spark.createDataFrame([(1.0,), (3.0,)], "value double")
    out = df.agg(F.expr("percentile(value, 0.5)").alias("p")).collect()[0].p
    assert out == 2.0
    df2 = spark.createDataFrame([(0.0,), (10.0,)], "value double")
    assert df2.agg(F.expr("percentile(value, 0.9)").alias("p")).collect()[0].p == 9.0


# ---------------------------------------------------------- pivot_weekday

def test_pivot_weekday_matches_calendar(spark):
    got = {
        r.event_type: [r[f"d{d}"] for d in range(1, 8)]
        for r in E.queries()["pivot_weekday"](spark, SF).collect()
    }
    exp: dict[str, list[int]] = defaultdict(lambda: [0] * 7)
    for r in _events_py():
        # Spark dayofweek: 1=Sunday..7=Saturday; python weekday: 0=Monday
        d = (r["ts"].weekday() + 1) % 7 + 1
        exp[r["event_type"]][d - 1] += 1
    assert got == dict(exp)


def test_pivot_weekday_row_sums_equal_type_counts(spark):
    per_type = defaultdict(int)
    for r in _events_py():
        per_type[r["event_type"]] += 1
    for r in E.queries()["pivot_weekday"](spark, SF).collect():
        assert sum(r[f"d{d}"] for d in range(1, 8)) == per_type[r.event_type]


# ------------------------------------------------------ running_user_value

def test_running_user_value_matches_python_scan(spark):
    got = [
        (r.user_id, r.event_id, r.running_total, r.mavg3, r.rk)
        for r in E.queries()["running_user_value"](spark, SF).collect()
    ]
    by_user = defaultdict(list)
    for r in _events_py():
        if r["user_id"] < 10:
            by_user[r["user_id"]].append(r)
    exp = []
    for uid in sorted(by_user):
        seq = sorted(by_user[uid], key=lambda r: (r["ts"], r["event_id"]))
        run = 0.0
        window3: list[float] = []
        for i, r in enumerate(seq):
            v = round(float(r["value"]), 4)  # decimal(18,4) quantization
            run += v
            window3.append(v)
            if len(window3) > 3:
                window3.pop(0)
            exp.append(
                (
                    uid,
                    r["event_id"],
                    round(run, 4),
                    round(sum(window3) / len(window3), 4),
                    i + 1,  # (ts, event_id) is a total order -> rank = pos
                )
            )
    exp.sort(key=lambda t: (t[0], t[1]))
    got.sort(key=lambda t: (t[0], t[1]))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[:2] == e[:2] and g[4] == e[4]
        assert g[2] == pytest.approx(e[2], abs=1e-3), g
        assert g[3] == pytest.approx(e[3], abs=1e-3), g


# ----------------------------------------------------- user_value_quartiles

def _ntile(n: int, k: int) -> list[int]:
    """The SQL-standard NTILE bucket sequence for n rows, k tiles: first
    (n mod k) buckets get ceil(n/k) rows, the rest floor(n/k)."""
    q, rem = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + (1 if b <= rem else 0)))
    return out


def test_ntile_bucket_size_law_exhaustive(spark):
    # every n in 1..13: bucket sizes differ by <=1 and are non-increasing
    rows = [(i, float(i % 5), i) for i in range(13)]
    df = spark.createDataFrame(rows, "user_id int, value double, event_id int")
    from pyspark.sql import Window

    for n in range(1, 14):
        sub = df.limit(0).unionByName(
            spark.createDataFrame(rows[:n], df.schema)
        )
        w = Window.partitionBy(F.lit(1)).orderBy("value", "event_id")
        got = [
            r.q
            for r in sub.select(F.ntile(4).over(w).alias("q"))
            .orderBy("q")
            .collect()
        ]
        assert got == _ntile(n, 4), n


def test_user_value_quartiles_matches_python_ntile(spark):
    got = {
        (r.user_id, r.quartile): (r.n, r.lo, r.hi, r.mean_value)
        for r in E.queries()["user_value_quartiles"](spark, SF).collect()
    }
    by_user = defaultdict(list)
    for r in _events_py():
        by_user[r["user_id"]].append((float(r["value"]), r["event_id"]))
    exp = {}
    for uid, vals in by_user.items():
        vals.sort()
        tiles = _ntile(len(vals), 4)
        per_q = defaultdict(list)
        for (v, _), q in zip(vals, tiles):
            per_q[q].append(v)
        for q, vs in per_q.items():
            exp[(uid, q)] = (
                len(vs),
                round(min(vs), 4),
                round(max(vs), 4),
                round(sum(vs) / len(vs), 4),
            )
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        for i in (1, 2, 3):
            assert got[k][i] == pytest.approx(exp[k][i], abs=1e-3), k


# ------------------------------------------------------- window_dist_funcs

def test_window_dist_funcs_closed_form(spark):
    got = {
        r.o_orderkey: (r.o_orderpriority, r.pr, r.cd)
        for r in E.queries()["window_dist_funcs"](spark, SF).collect()
    }
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    rows = list(
        zip(
            t.column("o_orderkey").to_pylist(),
            t.column("o_orderpriority").to_pylist(),
            [float(x) for x in t.column("o_totalprice").to_pylist()],
        )
    )
    by_prio = defaultdict(list)
    for k, p, v in rows:
        by_prio[p].append((v, k))
    exp = {}
    for p, vs in by_prio.items():
        vs.sort()
        n = len(vs)
        for i, (v, k) in enumerate(vs):
            # (value, key) is a total order: rank = i+1, |{<= current}| = i+1
            pr = 0.0 if n == 1 else i / (n - 1)
            cd = (i + 1) / n
            if k % 50 == 0:
                exp[k] = (p, round(pr, 6), round(cd, 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-6), k
        assert got[k][2] == pytest.approx(exp[k][2], abs=1e-6), k


def test_percent_rank_tie_law(spark):
    # ties share percent_rank (min-rank) and cume_dist counts ALL peers
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 20.0), (4, 30.0)], "id int, v double"
    )
    w = Window.partitionBy(F.lit(1)).orderBy("v")
    out = {
        r.id: (r.pr, r.cd)
        for r in df.select(
            "id",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    assert out[1] == (0.0, 0.5) and out[2] == (0.0, 0.5)
    assert out[3] == (pytest.approx(2 / 3), 0.75)
    assert out[4] == (1.0, 1.0)


# ------------------------------------------------------------- sessionize

def _sessionize_py(rows, gap_us=1_800_000_000):
    """Pure-python gaps-and-islands: rows = [(ts_us, event_id)] one user."""
    rows = sorted(rows)
    sessions = []
    cur = []
    prev = None
    for ts, eid in rows:
        if prev is not None and ts - prev > gap_us:
            sessions.append(cur)
            cur = []
        cur.append((ts, eid))
        prev = ts
    if cur:
        sessions.append(cur)
    return sessions


def test_sessionize_matches_python(spark):
    got = defaultdict(list)
    for r in E.queries()["sessionize"](spark, SF).collect():
        got[r.user_id].append((r.session_id, r.session_start, r.session_end, r.n_events))
    by_user = defaultdict(list)
    for r in _events_py():
        us = int(
            (r["ts"] - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
        )
        # rebuild exact integer microseconds (total_seconds loses precision)
        us = (r["ts"] - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        by_user[r["user_id"]].append((us, r["event_id"]))
    assert set(got) == set(by_user)
    for uid, evs in by_user.items():
        sessions = _sessionize_py(evs)
        assert len(got[uid]) == len(sessions), uid
        for (sid, _, _, n), sess in zip(sorted(got[uid]), sessions):
            assert n == len(sess), (uid, sid)


def test_sessionize_gap_boundary_is_strict(spark):
    # gap == exactly 1800s stays one session; 1800s + 1us splits
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1),
        (1, base + dt.timedelta(seconds=1800), 2),          # same session
        (1, base + dt.timedelta(seconds=3600, microseconds=1), 3),  # new
        (2, base, 4),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    df.createOrReplaceTempView("__sess_probe")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > 1_800_000_000,
        1,
    ).otherwise(0)
    sess = df.select("user_id", "ts", "event_id", gap.alias("g")).withColumn(
        "sid",
        F.sum("g").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    out = {r.event_id: r.sid for r in sess.collect()}
    assert out[1] == 0 and out[2] == 0 and out[3] == 1 and out[4] == 0


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=4_000_000_000), min_size=1, max_size=20
    )
)
def test_sessionize_property_session_count(spark, gaps):
    # session count == 1 + number of gaps strictly over 30 min
    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    rows = [
        (1, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=t), i)
        for i, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > 1_800_000_000,
        1,
    ).otherwise(0)
    n_sessions = (
        df.select(gap.alias("g")).agg((F.sum("g") + 1).alias("n")).collect()[0].n
    )
    assert n_sessions == len(_sessionize_py([(t, i) for i, t in enumerate(ts)]))


# ------------------------------------------------------------ asof_clicks

def _asof_py(purchases, clicks):
    """purchases/clicks: [(user, ts_us, id)] -> {purchase_id: ts_us|None}."""
    by_user = defaultdict(list)
    for u, t, _ in clicks:
        by_user[u].append(t)
    for u in by_user:
        by_user[u].sort()
    out = {}
    import bisect

    for u, t, pid in purchases:
        ca = by_user.get(u, [])
        i = bisect.bisect_right(ca, t)
        out[pid] = ca[i - 1] if i else None
    return out


def test_asof_clicks_matches_python_bisect(spark):
    got = {
        r.event_id: r.last_click_ts
        for r in E.queries()["asof_clicks"](spark, SF).collect()
    }
    purchases, clicks = [], []
    for r in _events_py():
        us = (r["ts"] - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        if r["event_type"] == "purchase":
            purchases.append((r["user_id"], us, r["event_id"]))
        elif r["event_type"] == "click":
            clicks.append((r["user_id"], us, r["event_id"]))
    exp = _asof_py(purchases, clicks)
    assert set(got) == set(exp)
    for pid, ts_us in exp.items():
        if ts_us is None:
            assert got[pid] is None, pid
        else:
            e = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=ts_us)
            assert got[pid] == e.strftime("%Y-%m-%d %H:%M:%S.%f"), pid


def test_asof_join_tie_and_no_match_laws(spark):
    from ingestion_scripts_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("a", 100, 1), ("a", 50, 2), ("b", 10, 3)], "k string, ts long, pid int"
    )
    right = spark.createDataFrame(
        # tie at exactly ts=100 must match ('<=' law); 60 matches pid=1&2's
        # 100/50?  50: latest <= 50 is 40
        [("a", 100), ("a", 60), ("a", 40)],
        "k string, ts long",
    )
    out = {
        r.pid: r.asof_ts
        for r in asof_join(left, right, on="k", right_values=[]).collect()
    }
    assert out == {1: 100, 2: 40, 3: None}


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lts=st.lists(st.integers(0, 1000), min_size=1, max_size=10),
    rts=st.lists(st.integers(0, 1000), min_size=0, max_size=10),
)
def test_asof_join_property(spark, lts, rts):
    from ingestion_scripts_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u", t, i) for i, t in enumerate(lts)], "k string, ts long, pid int"
    )
    right = spark.createDataFrame(
        [("u", t) for t in rts], "k string, ts long"
    ) if rts else spark.createDataFrame([], "k string, ts long")
    out = {
        r.pid: r.asof_ts
        for r in asof_join(left, right, on="k", right_values=[]).collect()
    }
    exp = _asof_py(
        [("u", t, i) for i, t in enumerate(lts)],
        [("u", t, None) for t in rts],
    )
    assert out == exp


# --------------------------------------------------- pipeline text stages

from ingestion_scripts_spark.functions.text import (
    BRACKET_SPAN,
    DIGIT_WORD,
    PUNCT_CLASS,
    STOPWORDS,
    clean_text,
    extract_hashtags,
    pairwise_bigrams,
    remove_stopwords,
    tokenize_ws,
)

_ADVERSARIAL = [
    "Hello [inner [span] trailing] World!",
    "a1b c2 3d four f-i_v_e",
    "  #Tag1 #tag_two ##double #!bang #ümlaut#tail  ",
    "the quick THE Quick the",
    "",
    "   ",
    "[unclosed bracket",
    "closed] bracket[",
    "punct!!!only???",
    "emoji 🙂 stays words2go gone",
    "don't can't won't it's",
    "a\tb\nc d  e",
]


def _clean_py(s: str) -> str:
    # the reference chain (src/reddit_consumer.py:58-64) with ASCII \w —
    # Java regex / RE2 semantics, which the engine deliberately pins
    s = s.lower()
    s = re.sub(r"\[.*?\]", "", s)
    s = re.sub(PUNCT_CLASS, "", s)
    s = re.sub(r"\w*\d\w*", "", s, flags=re.ASCII)
    return s


def test_clean_text_matches_python_re(spark):
    df = spark.createDataFrame([(s,) for s in _ADVERSARIAL], "text string")
    got = [r.c for r in df.select(clean_text(F.col("text")).alias("c")).collect()]
    assert got == [_clean_py(s) for s in _ADVERSARIAL]


def test_extract_hashtags_matches_python_re(spark):
    df = spark.createDataFrame([(s,) for s in _ADVERSARIAL], "text string")
    got = [r.h for r in df.select(extract_hashtags(F.col("text")).alias("h")).collect()]
    exp = [re.findall(r"#(\w+)", s, flags=re.ASCII) for s in _ADVERSARIAL]
    assert got == exp


def test_stopword_filter_preserves_duplicates_and_order(spark):
    toks = ["the", "cat", "the", "cat", "sat", "i", "me", "sat"]
    df = spark.createDataFrame([(toks,)], "t array<string>")
    got = df.select(remove_stopwords(F.col("t")).alias("o")).collect()[0].o
    assert got == [w for w in toks if w not in set(STOPWORDS)]
    assert got == ["cat", "cat", "sat", "sat"]


def test_pairwise_bigrams_canonical_law(spark):
    cases = [
        (["b", "a", "c"], [["a", "b"], ["a", "c"]]),
        (["x"], []),
        ([], []),
        (["same", "same"], [["same", "same"]]),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t array<string>")
    got = [r.b for r in df.select(pairwise_bigrams(F.col("t")).alias("b")).collect()]
    assert got == [e for _, e in cases]


def test_tokenize_ws_drops_empties_keeps_order(spark):
    df = spark.createDataFrame([("  a  b ",), ("", ), ("x y",)], "t string")
    got = [r.o for r in df.select(tokenize_ws(F.col("t")).alias("o")).collect()]
    assert got == [["a", "b"], [], ["x", "y"]]


# ------------------------------------------- ADVICE r9 hostile-name guards

def test_global_rank_rejects_reserved_columns(spark):
    from ingestion_scripts_spark.operators.ranking import global_rank

    df = spark.createDataFrame([(1, 2)], "v int, __mid int")
    with pytest.raises(ValueError, match="__mid"):
        global_rank(df, [F.asc("v")])
    df2 = spark.createDataFrame([(1, 2)], "v int, rn int")
    with pytest.raises(ValueError, match="rn"):
        global_rank(df2, [F.asc("v")])


def test_asof_join_rejects_reserved_columns(spark):
    from ingestion_scripts_spark.operators.joins import asof_join

    left = spark.createDataFrame([("a", 1, 9)], "k string, ts long, __side long")
    right = spark.createDataFrame([("a", 1)], "k string, ts long")
    with pytest.raises(ValueError, match="__side"):
        asof_join(left, right, on="k")


def test_fd_strength_rejects_empty_pairs(spark):
    from ingestion_scripts_spark.operators.dq import fd_strength

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="non-empty"):
        fd_strength(df, [])
