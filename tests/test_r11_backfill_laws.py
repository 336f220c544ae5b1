"""Law-test backfill, r11 batch 1: the part01 SQL-shaped block that had
oracle-only protection (r10-VERDICT item 2). Every reference here is a
pure-Python recompute from the sf0.001 parquet (pyarrow — no SQL engine),
replicating Spark's arithmetic conventions exactly where they matter:
per-item ``cast(decimal(18,4))`` quantization is ROUND_HALF_UP, terminal
``F.round(x, 2)`` on a double is Java ``BigDecimal(double)`` half-up —
i.e. ``Decimal(float)`` (the exact binary value), never ``repr``."""

from __future__ import annotations

import datetime as dt
import re
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


def _q4(x: float) -> Decimal:
    """Spark ``cast(double AS decimal(18,4))``: half-up at 4 places of the
    exact binary value."""
    return Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)


def _round2(x) -> float:
    """Spark ``F.round(double, 2)`` / round on an exact Decimal."""
    return float(Decimal(x).quantize(Decimal("0.01"), ROUND_HALF_UP))


# ------------------------------------------------------------- top_orders


def test_top_orders_matches_python(spark):
    cust = {r["c_custkey"] for r in _rows("customer")
            if r["c_mktsegment"] == "BUILDING"}
    okey_cust = {r["o_orderkey"]: r["o_custkey"] for r in _rows("orders")}
    rev = defaultdict(Decimal)
    for li in _rows("lineitem"):
        ok = li["l_orderkey"]
        if okey_cust.get(ok) in cust:
            rev[ok] += _q4(li["l_extendedprice"] * (1 - li["l_discount"]))
    want = sorted(
        ((_round2(v), k) for k, v in rev.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [
        (r.revenue, r.o_orderkey)
        for r in E.queries()["top_orders"](spark, SF).collect()
    ]
    assert got == want


# -------------------------------------------------------- cust_order_dist


def test_cust_order_dist_matches_python(spark):
    per = {r["c_custkey"]: 0 for r in _rows("customer")}
    for o in _rows("orders"):
        if o["o_custkey"] in per:
            per[o["o_custkey"]] += 1
    dist = defaultdict(int)
    for k in per.values():
        dist[k] += 1
    want = sorted(
        ((c, cd) for c, cd in dist.items()), key=lambda t: (-t[1], -t[0])
    )
    got = [
        (r.c_count, r.custdist)
        for r in E.queries()["cust_order_dist"](spark, SF).collect()
    ]
    assert got == want
    # zero-order customers MUST be present (the left-join contract)
    assert 0 in dist or all(v > 0 for v in per.values())


# --------------------------------------------------------- rollup_revenue


def test_rollup_revenue_rollup_identities(spark):
    nation = {r["n_nationkey"]: (r["n_regionkey"], r["n_name"])
              for r in _rows("nation")}
    region = {r["r_regionkey"]: r["r_name"] for r in _rows("region")}
    cnat = {r["c_custkey"]: r["c_nationkey"] for r in _rows("customer")}
    per = defaultdict(Decimal)
    for o in _rows("orders"):
        nk = cnat.get(o["o_custkey"])
        if nk is None or nk not in nation:
            continue
        rk, nname = nation[nk]
        per[(region[rk], nname)] += _q4(o["o_totalprice"])
    got = {
        (r.r_name, r.n_name): (r.revenue, r.lvl)
        for r in E.queries()["rollup_revenue"](spark, SF).collect()
    }
    # leaf level
    for (rn, nn), v in per.items():
        assert got[(rn, nn)] == (_round2(v), 0)
    # region subtotals and the grand total, each at its grouping level
    by_region = defaultdict(Decimal)
    for (rn, _), v in per.items():
        by_region[rn] += v
    for rn, v in by_region.items():
        assert got[(rn, None)] == (_round2(v), 1)
    assert got[(None, None)] == (_round2(sum(per.values())), 3)
    assert len(got) == len(per) + len(by_region) + 1


# --------------------------------------------------------- distinct_users


def test_distinct_users_matches_python(spark):
    users, events = defaultdict(set), defaultdict(int)
    for e in _rows("events"):
        users[e["event_type"]].add(e["user_id"])
        events[e["event_type"]] += 1
    got = {
        r.event_type: (r.n_users, r.n_events)
        for r in E.queries()["distinct_users"](spark, SF).collect()
    }
    assert got == {t: (len(users[t]), events[t]) for t in users}


# ------------------------------------------------- small_quantity_revenue


def test_small_quantity_revenue_matches_python(spark):
    li = _rows("lineitem")
    qty = defaultdict(list)
    for r in li:
        qty[r["l_partkey"]].append(r["l_quantity"])
    half = {k: (sum(v) / len(v)) * 0.5 for k, v in qty.items()}
    picked = [r for r in li if r["l_quantity"] < half[r["l_partkey"]]]
    total = sum((_q4(r["l_extendedprice"]) for r in picked), Decimal(0))
    want = (_round2(float(total) / 7.0), len(picked))
    row = E.queries()["small_quantity_revenue"](spark, SF).collect()[0]
    assert (row.avg_yearly, row.n_items) == want


# ------------------------------------------------------ in_subquery_parts


def test_in_subquery_parts_matches_python(spark):
    returned = {r["l_partkey"] for r in _rows("lineitem")
                if r["l_returnflag"] == "R"}
    brands = defaultdict(int)
    for p in _rows("part"):
        if p["p_partkey"] in returned:
            brands[p["p_brand"]] += 1
    got = {
        r.brand: r.n_parts
        for r in E.queries()["in_subquery_parts"](spark, SF).collect()
    }
    assert got == dict(brands)


# ------------------------------------------------ clicked_never_purchased


def test_clicked_never_purchased_set_algebra(spark):
    ev = _rows("events")
    clickers = {e["user_id"] for e in ev if e["event_type"] == "click"}
    cutoff = dt.datetime(2024, 1, 5)
    early_buyers = {
        e["user_id"]
        for e in ev
        if e["event_type"] == "purchase" and e["ts"] < cutoff
    }
    got = [
        r.user_id
        for r in E.queries()["clicked_never_purchased"](spark, SF).collect()
    ]
    assert got == sorted(clickers - early_buyers)


# ------------------------------------------------ parts_never_discounted


def test_parts_never_discounted_matches_python(spark):
    li = _rows("lineitem")
    offenders = {r["l_partkey"] for r in li if r["l_discount"] > 0.09}
    agg = defaultdict(lambda: [0, Decimal(0)])
    for r in li:
        if r["l_partkey"] not in offenders:
            a = agg[r["l_partkey"]]
            a[0] += 1
            a[1] += _q4(r["l_extendedprice"])
    got = [
        (r.l_partkey, r.n_items, r.revenue)
        for r in E.queries()["parts_never_discounted"](spark, SF).collect()
    ]
    assert got == [
        (k, agg[k][0], _round2(agg[k][1])) for k in sorted(agg)
    ]


# ---------------------------------------------------- dead_letter_routing


def test_dead_letter_routing_matches_python_re(spark):
    chan = defaultdict(int)
    for e in _rows("events"):
        m = re.search(r'"k":\s*(\d+)', e["props"] or "")
        good = m is not None and int(m.group(1)) < 90
        chan[(e["event_type"], "good" if good else "dead")] += 1
    got = {
        (r.event_type, r.channel): r.n
        for r in E.queries()["dead_letter_routing"](spark, SF).collect()
    }
    assert got == dict(chan)


# --------------------------------------------------------- hourly_windows


def test_hourly_windows_matches_python(spark):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for e in _rows("events"):
        start = e["ts"].replace(minute=0, second=0, microsecond=0)
        key = (start.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])
        agg[key][0] += 1
        agg[key][1] += _q4(e["value"])
    got = [
        (r.window_start, r.event_type, r.n, r.total_value)
        for r in E.queries()["hourly_windows"](spark, SF).collect()
    ]
    want = [
        (ws, et, n, _round2(v)) for (ws, et), (n, v) in sorted(agg.items())
    ]
    assert got == want


# -------------------------------------------------------- stopword_filter


#: string.punctuation as a class — re-derived, not imported (the engine
#: pins the same set in functions.text.PUNCT_CLASS)
PUNCT = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""


def _pipeline_tokens(text: str) -> list[str]:
    from ingestion_scripts_spark.functions.text import STOPWORDS

    s = text.lower()
    s = re.sub(r"\[.*?\]", "", s)
    s = re.sub(PUNCT, "", s)
    s = re.sub(r"\w*\d\w*", "", s, flags=re.ASCII)
    toks = [t for t in s.split(" ") if t != ""]
    sw = set(STOPWORDS)
    return [t for t in toks if t not in sw]


def test_stopword_filter_end_to_end(spark):
    want = {
        d["doc_id"]: "|".join(_pipeline_tokens(d["text"]))
        for d in _rows("documents")
    }
    got = {
        r.doc_id: r.tokens
        for r in E.queries()["stopword_filter"](spark, SF).collect()
    }
    assert got == want
