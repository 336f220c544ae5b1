"""Law-test backfill, r11 batch 4: the part04 decorrelation/source block.
Pure-Python references from the sf0.001 parquet. interval_join_bucketed
additionally gets the PLAN-EQUIVALENCE law stated by its docstring: the
bucketed equi-join rewrite must produce row-for-row the broadcast
nested-loop range join's result (one python reference serves both)."""

from __future__ import annotations

import datetime as dt
import json
from collections import defaultdict

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


def _props_k(props):
    try:
        k = json.loads(props).get("k")
    except (TypeError, json.JSONDecodeError):
        return None
    return int(k) if k is not None else None


# ---------------------------------------------------------- safe_cast_ingest


def test_safe_cast_ingest_try_cast_semantics(spark):
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for e in _rows("events"):
        k = _props_k(e["props"])
        m = e["event_id"] % 5
        # the dirty-string construction, then try_cast: trims whitespace,
        # NULL on any non-numeric remainder
        if m == 2:
            parsed = k  # " k " -> trimmed -> k
        elif m == 4:
            parsed = k
        else:
            parsed = None  # "N/A", "", "kx"
        a = agg[e["event_type"]]
        a[0] += 1
        if parsed is not None:
            a[1] += 1
            a[3] += parsed
        else:
            a[2] += 1
    got = {
        r.event_type: (r.n_total, r.n_parsed, r.n_bad, r.sum_parsed)
        for r in E.queries()["safe_cast_ingest"](spark, SF).collect()
    }
    assert got == {t: tuple(v) for t, v in agg.items()}


# ------------------------------------------------- interval_join_bucketed


def _interval_join_ref():
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
    return dict(agg)


def test_interval_join_bucketed_matches_python(spark):
    got = {
        (r.win_start, r.event_type): r.n
        for r in E.queries()["interval_join_bucketed"](spark, SF).collect()
    }
    assert got == _interval_join_ref()


def test_interval_join_rewrite_equivalence(spark):
    """The bucketed equi-join rewrite ≡ the BNLJ range join, row for row
    (the docstring's contract — same result, different physical shape)."""
    a = sorted(
        map(tuple, E.queries()["interval_join_hot_hours"](spark, SF).collect())
    )
    b = sorted(
        map(tuple, E.queries()["interval_join_bucketed"](spark, SF).collect())
    )
    assert a == b


# ----------------------------------------------------------------- xml_source


def test_xml_source_roundtrip_lossless(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for d in _rows("documents"):
        a = agg[d["source"]]
        a[0] += 1
        a[1] += d["n_chars"]
        a[2] += len(d["text"])
    got = {
        r.source: (r.n_docs, r.total_chars, r.total_text_len)
        for r in E.queries()["xml_source"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# -------------------------------------------------------- supplier_wait_fault


def test_supplier_wait_fault_q21_law(spark):
    odate = {
        o["o_orderkey"]: o["o_orderdate"]
        for o in _rows("orders")
        if o["o_orderstatus"] == "F"
    }
    per_order = defaultdict(lambda: [set(), set()])  # suppliers, late supp
    for li in _rows("lineitem"):
        ok = li["l_orderkey"]
        if ok not in odate:
            continue
        a = per_order[ok]
        a[0].add(li["l_suppkey"])
        late = li["l_shipdate"].date() > (
            odate[ok].date() + dt.timedelta(days=90)
        )
        if late:
            a[1].add(li["l_suppkey"])
    numwait = defaultdict(int)
    for suppliers, late in per_order.values():
        if len(suppliers) >= 2 and len(late) == 1:
            numwait[next(iter(late))] += 1
    sname = {s["s_suppkey"]: s["s_name"] for s in _rows("supplier")}
    want = sorted(
        ((sname[k], n) for k, n in numwait.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = [
        (r.s_name, r.numwait)
        for r in E.queries()["supplier_wait_fault"](spark, SF).collect()
    ]
    assert got == want


# --------------------------------------------------------- lateral_top_orders


def test_lateral_top_orders_topn_per_key(spark):
    rich = sorted(
        c["c_custkey"] for c in _rows("customer") if c["c_acctbal"] > 9000
    )
    per = defaultdict(list)
    for o in _rows("orders"):
        per[o["o_custkey"]].append((o["o_totalprice"], o["o_orderkey"]))
    want = []
    for ck in rich:
        top = sorted(per.get(ck, []), key=lambda t: (-t[0], t[1]))[:3]
        want.extend((ck, okey, price) for price, okey in top)
    got = [
        (r.c_custkey, r.o_orderkey, r.o_totalprice)
        for r in E.queries()["lateral_top_orders"](spark, SF).collect()
    ]
    assert got == want


# ----------------------------------------------------------- schema_evolution


def test_schema_evolution_merge_schema_law(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for e in _rows("events"):
        a = agg[e["event_type"]]
        a[0] += 1
        if e["event_id"] % 2 == 1:  # the late batch carries k
            k = _props_k(e["props"])
            if k is not None:
                a[1] += 1
                a[2] += k
    got = {
        r.event_type: (r.n, r.n_with_k, r.sum_k)
        for r in E.queries()["schema_evolution"](spark, SF).collect()
    }
    assert got == {t: tuple(v) for t, v in agg.items()}


# ---------------------------------------------------------- dup_cluster_stats


def test_dup_cluster_stats_partitions_corpus(spark):
    """The histogram must PARTITION the corpus (Σ size·n_clusters ==
    n_docs) and agree with a python groupby of the engine's own cluster
    assignment (the near-dup graph itself is law-tested at the operator
    level: minhash banding + star CC)."""
    n_docs = pq.read_table(f"{SF}/documents.parquet").num_rows
    hist = {
        r.cluster_size: r.n_clusters
        for r in E.queries()["dup_cluster_stats"](spark, SF).collect()
    }
    assert sum(s * n for s, n in hist.items()) == n_docs
    sizes = defaultdict(int)
    for r in E.queries()["dup_clusters"](spark, SF).collect():
        sizes[r.cluster_id] += 1
    want = defaultdict(int)
    for s in sizes.values():
        want[s] += 1
    assert hist == dict(want)
    assert hist.get(2, 0) > 0  # the corpus plants twin documents
