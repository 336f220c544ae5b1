"""Law-test backfill, batch 2 (VERDICT r9 item 1 continued): the r2-r4
query block beyond the verdict's named list, each checked against a
pure-Python reference computed from the same sf0.001 parquet — never the
oracle SQL.

Covers: cumulative_users (first-seen rewrite ≡ naive cumulative
distinct), rolling_7d_value (RANGE frame ≡ O(n²) python scan),
event_transitions (lead ≡ python pairing), ewma_user_value (fold
recurrence), anomaly_zscore (trailing-24-ROWS z-score), retention_cohorts
(Monday-week cohort matrix), stats_corr (textbook Pearson / covar_samp /
stddev_samp), lang_histograms (histogram string assembly)."""

from __future__ import annotations

import datetime as dt
import json
import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _events():
    t = pq.read_table(f"{SF}/events.parquet")
    cols = t.column_names
    rows = [dict(zip(cols, r)) for r in zip(*[t.column(c).to_pylist() for c in cols])]
    for r in rows:
        ts = r["ts"]
        if isinstance(ts, int):
            r["ts"] = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=ts // 1000)
        elif getattr(ts, "tzinfo", None) is not None:
            r["ts"] = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return rows


# --------------------------------------------------------- cumulative_users


def test_cumulative_users_first_seen_rewrite_law(spark):
    got = [
        (r.day, r.new_users, r.cum_users)
        for r in E.queries()["cumulative_users"](spark, SF).collect()
    ]
    first = {}
    for r in _events():
        try:
            k = json.loads(r["props"]).get("k")
            ks = "" if k is None else str(k)
        except Exception:
            ks = ""
        ent = f"{r['user_id']}:{ks}"
        d = r["ts"].date()
        if ent not in first or d < first[ent]:
            first[ent] = d
    per_day = defaultdict(int)
    for d in first.values():
        per_day[d] += 1
    exp, cum = [], 0
    for d in sorted(per_day):
        cum += per_day[d]
        exp.append((d.isoformat(), per_day[d], cum))
    assert got == exp
    # the rewrite law itself: final cumulative == |distinct entities|
    assert cum == len(first)


# --------------------------------------------------------- rolling_7d_value


def test_rolling_7d_value_matches_quadratic_scan(spark):
    got = [
        (r.user_id, r.ts, r.roll_value, r.roll_n)
        for r in E.queries()["rolling_7d_value"](spark, SF).collect()
    ]
    by_user = defaultdict(list)
    for r in _events():
        if r["event_type"] == "purchase":
            sec = (r["ts"] - dt.datetime(1970, 1, 1)) // dt.timedelta(seconds=1)
            by_user[r["user_id"]].append((sec, float(r["value"]), r["ts"]))
    exp = []
    for uid in by_user:
        rows = sorted(by_user[uid])
        for sec, _, ts in rows:
            frame = [v for s, v, _ in rows if sec - 604800 <= s <= sec]
            exp.append(
                (
                    uid,
                    ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                    round(sum(round(v, 4) for v in frame), 4),
                    len(frame),
                )
            )
    exp.sort(key=lambda t: (t[0], t[1]))
    got.sort(key=lambda t: (t[0], t[1]))
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1] and g[3] == e[3], (g, e)
        assert g[2] == pytest.approx(e[2], abs=1e-3), (g, e)


# -------------------------------------------------------- event_transitions


def test_event_transitions_matches_python_pairing(spark):
    got = {
        (r.from_type, r.to_type): r.n
        for r in E.queries()["event_transitions"](spark, SF).collect()
    }
    by_user = defaultdict(list)
    for r in _events():
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    exp = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            exp[(a, b)] += 1
    assert got == dict(exp)
    # conservation law: sum of transitions == sum of (per-user n-1)
    assert sum(got.values()) == sum(len(v) - 1 for v in by_user.values() if v)


# --------------------------------------------------------- ewma_user_value


def test_ewma_matches_python_fold(spark):
    got = {
        r.user_id: (r.n_days, r.ewma)
        for r in E.queries()["ewma_user_value"](spark, SF).collect()
    }
    daily = defaultdict(float)
    for r in _events():
        daily[(r["user_id"], r["ts"].date())] += round(float(r["value"]), 4)
    series = defaultdict(list)
    for (uid, d), v in daily.items():
        series[uid].append((d, v))
    assert set(got) == set(series)
    for uid, dv in series.items():
        acc = 0.0
        for _, v in sorted(dv):
            acc = 0.3 * round(v, 4) + 0.7 * acc
        assert got[uid][0] == len(dv), uid
        assert got[uid][1] == pytest.approx(acc, abs=2e-4), uid


# ---------------------------------------------------------- anomaly_zscore


def test_anomaly_zscore_trailing_rows_law(spark):
    got = {
        (r.hour, r.event_type): (r.n, r.z)
        for r in E.queries()["anomaly_zscore"](spark, SF).collect()
    }
    hourly = defaultdict(int)
    for r in _events():
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[(r["event_type"], h)] += 1
    by_type = defaultdict(list)
    for (et, h), n in hourly.items():
        by_type[et].append((h, n))
    exp = {}
    for et, rows in by_type.items():
        rows.sort()
        for i in range(len(rows)):
            window = [n for _, n in rows[max(0, i - 24) : i]]
            if len(window) != 24:
                continue
            mu = sum(window) / 24
            var = sum((x - mu) ** 2 for x in window) / 23  # sample variance
            if var <= 0:
                continue
            h, n = rows[i]
            exp[(h.strftime("%Y-%m-%d %H:%M:%S"), et)] = (
                n,
                round((n - mu) / math.sqrt(var), 4),
            )
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-3), k


# -------------------------------------------------------- retention_cohorts


def test_retention_cohorts_matches_python(spark):
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in E.queries()["retention_cohorts"](spark, SF).collect()
    }
    first_week = {}
    weeks = defaultdict(set)
    for r in _events():
        d = r["ts"].date()
        monday = d - dt.timedelta(days=d.weekday())
        u = r["user_id"]
        weeks[u].add(monday)
        if u not in first_week or monday < first_week[u]:
            first_week[u] = monday
    exp = defaultdict(set)
    for u, wks in weeks.items():
        c = first_week[u]
        for w in wks:
            exp[(c.strftime("%Y-%m-%d %H:%M:%S"), (w - c).days // 7)].add(u)
    assert got == {k: len(v) for k, v in exp.items()}
    # cohort law: offset 0 of each cohort == cohort size
    sizes = defaultdict(int)
    for u, c in first_week.items():
        sizes[c.strftime("%Y-%m-%d %H:%M:%S")] += 1
    for c, n in sizes.items():
        assert got[(c, 0)] == n, c


# --------------------------------------------------------------- stats_corr


def test_stats_corr_textbook_formulas(spark):
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    rows = list(
        zip(
            li.column("l_returnflag").to_pylist(),
            [float(x) for x in li.column("l_quantity").to_pylist()],
            [float(x) for x in li.column("l_extendedprice").to_pylist()],
            [float(x) for x in li.column("l_discount").to_pylist()],
        )
    )
    groups = defaultdict(list)
    for f, q, p, d in rows:
        groups[f].append((q, p, d))
    got = {
        r.l_returnflag: (r.corr_qty_price, r.covar_qty_price, r.sd_discount, r.n)
        for r in E.queries()["stats_corr"](spark, SF).collect()
    }
    assert set(got) == set(groups)
    for f, g in groups.items():
        n = len(g)
        mq = sum(q for q, _, _ in g) / n
        mp = sum(p for _, p, _ in g) / n
        md = sum(d for _, _, d in g) / n
        cov = sum((q - mq) * (p - mp) for q, p, _ in g) / (n - 1)
        sq = math.sqrt(sum((q - mq) ** 2 for q, _, _ in g) / (n - 1))
        sp = math.sqrt(sum((p - mp) ** 2 for _, p, _ in g) / (n - 1))
        sd = math.sqrt(sum((d - md) ** 2 for _, _, d in g) / (n - 1))
        assert got[f][3] == n
        assert got[f][0] == pytest.approx(cov / (sq * sp), abs=1e-5), f
        assert got[f][1] == pytest.approx(cov, abs=0.51), f  # round(.,4) on 1e7-scale
        assert got[f][2] == pytest.approx(sd, abs=1e-5), f


# ----------------------------------------------------------- lang_histograms


def test_lang_histograms_assembly_law(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"])
    counts = defaultdict(int)
    for s, lg in zip(t.column("source").to_pylist(), t.column("lang").to_pylist()):
        counts[(s, lg)] += 1
    per_source = defaultdict(dict)
    for (s, lg), n in counts.items():
        per_source[s][lg] = n
    exp = {
        s: "|".join(f"{lg}:{d[lg]}" for lg in sorted(d))
        for s, d in per_source.items()
    }
    got = {
        r.source: r.histogram
        for r in E.queries()["lang_histograms"](spark, SF).collect()
    }
    assert got == exp
