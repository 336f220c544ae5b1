"""Law-test backfill, r11 batch 3: the part03 session/join/CDC block.
Pure-Python references from the sf0.001 parquet. The session trio pins
the THREE distinct boundary semantics the engine carries side by side:
native session_window (gap-exclusive end: a gap of exactly the timeout
STARTS a new session), the dynamic-gap merge (running-max horizon), and
the gaps-and-islands funnel sessionizer (strictly-greater gap breaks)."""

from __future__ import annotations

import datetime as dt
import json
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _rows(table):
    t = pq.read_table(f"{SF}/{table}.parquet")
    cols = t.column_names
    rows = [dict(zip(cols, r)) for r in zip(*[t.column(c).to_pylist() for c in cols])]
    for r in rows:
        for c, v in r.items():
            if isinstance(v, dt.datetime) and v.tzinfo is not None:
                r[c] = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return rows


def _fmt_us(ts: dt.datetime) -> str:
    return ts.strftime("%Y-%m-%d %H:%M:%S.%f")


def _round2(x) -> float:
    return float(Decimal(x).quantize(Decimal("0.01"), ROUND_HALF_UP))


def _by_user(events):
    per = defaultdict(list)
    for e in events:
        per[e["user_id"]].append(e)
    for v in per.values():
        v.sort(key=lambda e: (e["ts"], e["event_id"]))
    return per


# -------------------------------------------------- session_window_native


def test_session_window_native_matches_python(spark):
    gap = dt.timedelta(minutes=30)
    want = []
    for uid, evs in _by_user(_rows("events")).items():
        cur = None
        for e in evs:
            if cur is None or e["ts"] >= cur["end"]:  # ts == end -> NEW
                if cur:
                    want.append((uid, _fmt_us(cur["start"]), _fmt_us(cur["end"]),
                                 cur["n"]))
                cur = {"start": e["ts"], "end": e["ts"] + gap, "n": 0}
            cur["n"] += 1
            cur["end"] = e["ts"] + gap
        if cur:
            want.append((uid, _fmt_us(cur["start"]), _fmt_us(cur["end"]), cur["n"]))
    want.sort()
    got = [
        (r.user_id, r.session_start, r.session_end, r.n)
        for r in E.queries()["session_window_native"](spark, SF).collect()
    ]
    assert got == want


# ------------------------------------------------- session_window_dynamic


def test_session_window_dynamic_running_max_horizon(spark):
    g45, g15 = dt.timedelta(minutes=45), dt.timedelta(minutes=15)
    want = []
    for uid, evs in _by_user(_rows("events")).items():
        cur = None
        for e in evs:
            g = g45 if e["event_type"] == "purchase" else g15
            if cur is None or e["ts"] >= cur["end"]:
                if cur:
                    want.append((uid, _fmt_us(cur["start"]), _fmt_us(cur["end"]),
                                 cur["n"]))
                cur = {"start": e["ts"], "end": e["ts"] + g, "n": 0}
            cur["n"] += 1
            cur["end"] = max(cur["end"], e["ts"] + g)  # running-max horizon
        if cur:
            want.append((uid, _fmt_us(cur["start"]), _fmt_us(cur["end"]), cur["n"]))
    want.sort()
    got = [
        (r.user_id, r.session_start, r.session_end, r.n)
        for r in E.queries()["session_window_dynamic"](spark, SF).collect()
    ]
    assert got == want


# ---------------------------------------------------------- session_funnel


def test_session_funnel_strict_order_law(spark):
    want = {}
    for uid, evs in _by_user(_rows("events")).items():
        sessions, cur, prev = [], [], None
        for e in evs:
            if prev is not None and (e["ts"] - prev).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(e)
            prev = e["ts"]
        sessions.append(cur)
        r1 = r2 = r3 = 0
        for s in sessions:
            tv = min((e["ts"] for e in s if e["event_type"] == "view"),
                     default=None)
            tc = (
                min((e["ts"] for e in s
                     if e["event_type"] == "click" and e["ts"] > tv),
                    default=None)
                if tv is not None else None
            )
            tp = (
                min((e["ts"] for e in s
                     if e["event_type"] == "purchase" and e["ts"] > tc),
                    default=None)
                if tc is not None else None
            )
            r1 += tv is not None
            r2 += tc is not None
            r3 += tp is not None
        want[uid] = (len(sessions), r1, r2, r3)
    got = {
        r.user_id: (r.n_sessions, r.n_viewed, r.n_clicked_after_view,
                    r.n_converted)
        for r in E.queries()["session_funnel"](spark, SF).collect()
    }
    assert got == want
    # the strict-order law proper: every stage count is monotone
    for n_s, r1, r2, r3 in want.values():
        assert n_s >= r1 >= r2 >= r3


# ----------------------------------------------------- idle_rich_customers


def test_idle_rich_customers_matches_python(spark):
    nations = {0, 3, 7, 11, 19}
    cust = _rows("customer")
    pool = [c for c in cust if c["c_nationkey"] in nations]
    pos = [c["c_acctbal"] for c in pool if c["c_acctbal"] > 0.0]
    avg = sum(pos) / len(pos)
    active = {
        o["o_custkey"]
        for o in _rows("orders")
        if o["o_orderdate"] >= dt.datetime(2000, 1, 1)
    }
    agg = defaultdict(lambda: [0, Decimal(0)])
    for c in pool:
        if c["c_acctbal"] > avg and c["c_custkey"] not in active:
            a = agg[c["c_nationkey"]]
            a[0] += 1
            a[1] += Decimal(c["c_acctbal"]).quantize(
                Decimal("0.0001"), ROUND_HALF_UP
            )
    got = [
        (r.nation, r.n_cust, r.total_bal)
        for r in E.queries()["idle_rich_customers"](spark, SF).collect()
    ]
    assert got == [(k, agg[k][0], _round2(agg[k][1])) for k in sorted(agg)]


# ----------------------------------------------------- min_price_supplier


def test_min_price_supplier_matches_python(spark):
    li = _rows("lineitem")
    minp = {}
    for r in li:
        k = r["l_partkey"]
        if k not in minp or r["l_extendedprice"] < minp[k]:
            minp[k] = r["l_extendedprice"]
    brand = {p["p_partkey"] for p in _rows("part") if p["p_brand"] == "Brand#11"}
    sname = {s["s_suppkey"]: s["s_name"] for s in _rows("supplier")}
    want = sorted(
        {
            (r["l_partkey"], sname[r["l_suppkey"]],
             _round2(r["l_extendedprice"]))
            for r in li
            if r["l_partkey"] in brand
            and r["l_extendedprice"] == minp[r["l_partkey"]]
        }
    )
    got = [
        (r.p_partkey, r.s_name, r.price)
        for r in E.queries()["min_price_supplier"](spark, SF).collect()
    ]
    assert sorted(got) == want  # duplicates collapse only if rows coincide
    assert len(got) == len(
        [
            1
            for r in li
            if r["l_partkey"] in brand
            and r["l_extendedprice"] == minp[r["l_partkey"]]
        ]
    )


# --------------------------------------------------------------- orc_source


def test_orc_source_roundtrip_lossless(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for d in _rows("documents"):
        a = agg[(d["lang"], d["source"])]
        a[0] += 1
        a[1] += d["n_chars"]
        a[2] += len(d["text"])
    got = {
        (r.lang, r.source): (r.n_docs, r.total_chars, r.total_text_len)
        for r in E.queries()["orc_source"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# ------------------------------------------------- interval_join_hot_hours


def test_interval_join_hot_hours_matches_python(spark):
    ev = _rows("events")
    hours = defaultdict(int)
    for e in ev:
        if e["event_type"] == "purchase":
            hours[e["ts"].replace(minute=0, second=0, microsecond=0)] += 1
    top = sorted(hours.items(), key=lambda t: (-t[1], t[0]))[:5]
    agg = defaultdict(int)
    for h0, _ in top:
        lo, hi = h0 - dt.timedelta(minutes=30), h0 + dt.timedelta(minutes=90)
        for e in ev:
            if lo <= e["ts"] < hi:
                agg[(h0.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])] += 1
    got = {
        (r.win_start, r.event_type): r.n
        for r in E.queries()["interval_join_hot_hours"](spark, SF).collect()
    }
    assert got == dict(agg)


# ------------------------------------------------------------ snapshot_diff


def test_snapshot_diff_cdc_classes(spark):
    orders = _rows("orders")
    old = {
        o["o_orderkey"]: o["o_orderstatus"]
        for o in orders
        if o["o_orderdate"] < dt.datetime(1997, 1, 1)
    }
    new = {
        o["o_orderkey"]: ("X" if o["o_orderkey"] % 97 == 0 else o["o_orderstatus"])
        for o in orders
        if o["o_orderdate"] < dt.datetime(1998, 1, 1) and o["o_orderkey"] % 13 != 0
    }
    n = defaultdict(int)
    for k in old.keys() | new.keys():
        if k not in old:
            n["added"] += 1
        elif k not in new:
            n["removed"] += 1
        elif old[k] != new[k]:
            n["changed"] += 1
        else:
            n["unchanged"] += 1
    got = {
        r.change: r.n for r in E.queries()["snapshot_diff"](spark, SF).collect()
    }
    assert got == dict(n)
    assert set(got) == {"added", "removed", "changed", "unchanged"}


# ------------------------------------------------- top_customer_by_nation


def test_top_customer_by_nation_argmax_law(spark):
    nname = {r["n_nationkey"]: r["n_name"] for r in _rows("nation")}
    best = {}
    cnt = defaultdict(int)
    for c in _rows("customer"):
        nk = c["c_nationkey"]
        cnt[nk] += 1
        key = (
            int(Decimal(c["c_acctbal"] * 100).quantize(Decimal("1"),
                                                       ROUND_HALF_UP))
            * 10_000_000
            - c["c_custkey"]
        )
        if nk not in best or key > best[nk][0]:
            best[nk] = (key, c["c_custkey"])
    maxbal = defaultdict(float)
    for c in _rows("customer"):
        maxbal[c["c_nationkey"]] = max(
            maxbal.get(c["c_nationkey"], float("-inf")), c["c_acctbal"]
        )
    want = sorted(
        (nname[nk], best[nk][1], maxbal[nk], cnt[nk]) for nk in best
    )
    got = [
        (r.n_name, r.top_custkey, r.top_acctbal, r.n_cust)
        for r in E.queries()["top_customer_by_nation"](spark, SF).collect()
    ]
    assert got == want


# ------------------------------------------------------------ variant_props


def test_variant_props_matches_python_json(spark):
    agg = defaultdict(list)
    for e in _rows("events"):
        try:
            k = json.loads(e["props"]).get("k")
        except (TypeError, json.JSONDecodeError):
            k = None
        if k is not None:
            agg[e["event_type"]].append(int(k))
    n_all = defaultdict(int)
    for e in _rows("events"):
        n_all[e["event_type"]] += 1
    got = {
        r.event_type: (r.n, r.sum_k, r.min_k, r.max_k)
        for r in E.queries()["variant_props"](spark, SF).collect()
    }
    assert got == {
        t: (n_all[t], sum(agg[t]), min(agg[t]), max(agg[t])) for t in n_all
    }
