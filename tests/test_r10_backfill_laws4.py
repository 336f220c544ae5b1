"""Law-test backfill, batch 4: more r11-window anchors — pure-Python
references from the same parquet, never the oracle SQL.

Covers: first_touch_attribution (python sessionizer + first-click scan),
daily_gapfill (calendar densification + conservation law),
hash_sample_per_key (hexdigest ordering reference), score_quantile_norm
((rank-1)/(n-1) reference + range law), linear_interpolation (two-sided
carry + linear weight reference, observed rows bit-equal)."""

from __future__ import annotations

import datetime as dt
import hashlib
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


# ---------------------------------------------------- first_touch_attribution


def test_first_touch_matches_python_sessionizer(spark):
    got = {
        r.purchase_id: r.attributed_click_id
        for r in E.queries()["first_touch_attribution"](spark, SF).collect()
    }
    by_user = defaultdict(list)
    for r in _events():
        us = (r["ts"] - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        by_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    exp = {}
    for evs in by_user.values():
        evs.sort()
        sid, prev = 0, None
        sessions = defaultdict(list)
        for us, eid, et in evs:
            if prev is not None and us - prev > 1_800_000_000:
                sid += 1
            sessions[sid].append((us, eid, et))
            prev = us
        for sess in sessions.values():
            clicks = [(us, eid) for us, eid, et in sess if et == "click"]
            fc = min(clicks)[1] if clicks else -1
            for _, eid, et in sess:
                if et == "purchase":
                    exp[eid] = fc
    assert got == exp


# ------------------------------------------------------------- daily_gapfill


def test_daily_gapfill_calendar_and_conservation(spark):
    rows = E.queries()["daily_gapfill"](spark, SF).collect()
    per_user_days = defaultdict(list)
    totals = defaultdict(int)
    for r in rows:
        per_user_days[r.user_id].append(r.day)
        totals[r.user_id] += r.n_events
    obs = defaultdict(list)
    counts = defaultdict(int)
    for r in _events():
        obs[r["user_id"]].append(r["ts"].date())
        counts[r["user_id"]] += 1
    assert set(per_user_days) == set(obs)
    for u, days in per_user_days.items():
        d0, d1 = min(obs[u]), max(obs[u])
        expect = [
            (d0 + dt.timedelta(days=i)).isoformat()
            for i in range((d1 - d0).days + 1)
        ]
        assert sorted(days) == expect, u          # dense calendar, no gaps
        assert totals[u] == counts[u], u          # zeros add nothing


# -------------------------------------------------------- hash_sample_per_key


def test_hash_sample_matches_hexdigest_order(spark):
    got = defaultdict(list)
    for r in E.queries()["hash_sample_per_key"](spark, SF).collect():
        got[r.source].append((r.sample_rank, r.doc_id))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    per_src = defaultdict(list)
    for did, src in zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()):
        per_src[src].append((hashlib.md5(str(did).encode()).hexdigest(), did))
    exp = {
        s: [(i + 1, did) for i, (_, did) in enumerate(sorted(v)[:20])]
        for s, v in per_src.items()
    }
    assert dict(got) == exp


# ------------------------------------------------------- score_quantile_norm


def test_score_quantile_norm_rank_reference(spark):
    got = {
        r.doc_id: (r.source, r.pct)
        for r in E.queries()["score_quantile_norm"](spark, SF).collect()
    }
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    per_src = defaultdict(list)
    for did, src, nc in zip(
        t.column("doc_id").to_pylist(),
        t.column("source").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        per_src[src].append((nc, did))
    for src, v in per_src.items():
        v.sort()
        n = len(v)
        for i, (_, did) in enumerate(v):
            assert got[did][0] == src
            assert got[did][1] == pytest.approx(
                0.0 if n == 1 else i / (n - 1), abs=1e-3
            ), did
    # range law: every pct in [0, 1]; each source hits both endpoints
    per_src_pcts = defaultdict(list)
    for did, (src, pct) in got.items():
        per_src_pcts[src].append(pct)
    for src, ps in per_src_pcts.items():
        assert min(ps) == 0.0 and max(ps) == 1.0, src


# ------------------------------------------------------ linear_interpolation


def test_linear_interpolation_matches_python(spark):
    rows = E.queries()["linear_interpolation"](spark, SF).collect()
    daily = defaultdict(float)
    for r in _events():
        if r["event_type"] == "purchase":
            daily[(r["user_id"], r["ts"].date())] += round(float(r["value"]), 4)
    per_user = defaultdict(dict)
    for (u, d), v in daily.items():
        per_user[u][d] = round(v, 2)
    exp = {}
    for u, obs in per_user.items():
        d0, d1 = min(obs), max(obs)
        days = [d0 + dt.timedelta(days=i) for i in range((d1 - d0).days + 1)]
        for i, d in enumerate(days):
            if d in obs:
                exp[(u, d.isoformat())] = (obs[d], 1)
            else:
                pd_ = max(x for x in obs if x < d)
                nd = min(x for x in obs if x > d)
                wgt = (d - pd_).days / (nd - pd_).days
                exp[(u, d.isoformat())] = (
                    obs[pd_] + (obs[nd] - obs[pd_]) * wgt,
                    0,
                )
    assert len(rows) == len(exp)
    for r in rows:
        v, flag = exp[(r.user_id, r.day)]
        assert r.is_observed == flag, (r.user_id, r.day)
        assert r.value == pytest.approx(v, abs=1e-3), (r.user_id, r.day)
