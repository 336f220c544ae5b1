"""Law-test backfill, r11 batch 7 (final): the three SQL front doors and
the five remaining streaming queries. Streaming references re-derive the
SPARK-40925 lagged-watermark algebra in pure Python (late filter uses the
watermark from two batches back; append-mode emission uses the final
one) — the one behavior class a batch twin cannot express."""

from __future__ import annotations

import datetime as dt
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


def _q4(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)


def _round2(x) -> float:
    return float(Decimal(x).quantize(Decimal("0.01"), ROUND_HALF_UP))


# ------------------------------------------------------------ sql_front_door


def test_sql_front_door_matches_python(spark):
    nname = {n["n_nationkey"]: n["n_name"] for n in _rows("nation")}
    cnat = {c["c_custkey"]: c["c_nationkey"] for c in _rows("customer")}
    agg = defaultdict(lambda: [0, Decimal(0)])
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1996, 1, 1)
    for o in _rows("orders"):
        if lo <= o["o_orderdate"] < hi and o["o_custkey"] in cnat:
            a = agg[nname[cnat[o["o_custkey"]]]]
            a[0] += 1
            a[1] += _q4(o["o_totalprice"])
    want = sorted(
        ((n, c, _round2(v)) for n, (c, v) in agg.items()),
        key=lambda t: (-t[2], t[0]),
    )
    got = [
        (r.nation, r.n_orders, r.revenue)
        for r in E.queries()["sql_front_door"](spark, SF).collect()
    ]
    assert got == want


# ------------------------------------------------------- sql_pipe_front_door


def test_sql_pipe_front_door_matches_python(spark):
    seg_of = {c["c_custkey"]: c["c_mktsegment"] for c in _rows("customer")}
    agg = defaultdict(lambda: [0, Decimal(0)])
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1996, 1, 1)
    for o in _rows("orders"):
        if lo <= o["o_orderdate"] < hi and o["o_custkey"] in seg_of:
            a = agg[seg_of[o["o_custkey"]]]
            a[0] += 1
            a[1] += _q4(o["o_totalprice"])
    got = [
        tuple(r)
        for r in E.queries()["sql_pipe_front_door"](spark, SF).collect()
    ]
    # column order follows the pipe AGGREGATE clause (group key last or
    # first is dialect detail) — compare as dicts keyed by segment
    cols = E.queries()["sql_pipe_front_door"](spark, SF).columns
    si = cols.index("segment")
    got_d = {t[si]: tuple(v for i, v in enumerate(t) if i != si) for t in got}
    assert got_d == {s: (c, _round2(v)) for s, (c, v) in agg.items()}


# -------------------------------------------------------- recursive_front_door


def test_recursive_front_door_matches_python(spark):
    agg = defaultdict(lambda: [0, 0])
    for c in _rows("customer"):
        cur, depth = c["c_custkey"], 0
        while cur >= 10:
            cur //= 10
            depth += 1
        a = agg[cur]
        a[0] = max(a[0], depth)
        a[1] += 1
    got = {
        r.lead_digit: (r.max_depth, r.n_nodes)
        for r in E.queries()["recursive_front_door"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# ------------------------------------------------------------ partitioned_sink


def test_partitioned_sink_pruned_partition_content(spark):
    agg = defaultdict(lambda: [0, 0, None, None])
    for d in _rows("documents"):
        if d["lang"] != "en":
            continue
        a = agg[d["source"]]
        a[0] += 1
        a[1] += len(d["text"])
        a[2] = d["doc_id"] if a[2] is None else min(a[2], d["doc_id"])
        a[3] = d["doc_id"] if a[3] is None else max(a[3], d["doc_id"])
    got = {
        r.source: (r.n_docs, r.total_len, r.min_id, r.max_id)
        for r in E.queries()["partitioned_sink"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# ------------------------------------------------------ stream_idempotent_sink


def test_stream_idempotent_sink_exactly_once(spark):
    counts = defaultdict(int)
    for e in _rows("events"):
        counts[e["event_type"]] += 1
    got = {
        r.event_type: r.n
        for r in E.queries()["stream_idempotent_sink"](spark, SF).collect()
    }
    # batch 2 redelivers ALL of batch 1; the keyed anti-join sink must
    # still hold every event exactly once
    assert got == dict(counts)


# ------------------------------------------------------ stream_enriched_counts


def test_stream_enriched_counts_stream_static_join(spark):
    seg_of = {c["c_custkey"]: c["c_mktsegment"] for c in _rows("customer")}
    agg = defaultdict(lambda: [0, Decimal(0)])
    for e in _rows("events"):
        seg = seg_of.get(e["user_id"])
        if seg is None:
            continue
        a = agg[seg]
        a[0] += 1
        a[1] += _q4(e["value"])
    got = {
        r.c_mktsegment: (r.n, r.total_value)
        for r in E.queries()["stream_enriched_counts"](spark, SF).collect()
    }
    assert got == {s: (n, _round2(v)) for s, (n, v) in agg.items()}


# ----------------------------------------------------------- stream_late_drop


def test_stream_late_drop_lagged_watermark_algebra(spark):
    ev = _rows("events")
    delay = dt.timedelta(hours=2)
    max_even = max(e["ts"] for e in ev if e["event_id"] % 2 == 0)
    max_all = max(e["ts"] for e in ev)
    wm_late = max_even - delay  # the filter armed two batches back
    wm_final = max_all - delay  # emission watermark at query end

    def wstart(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    surviving = defaultdict(int)
    for e in ev:
        ws = wstart(e["ts"])
        wend = ws + dt.timedelta(hours=1)
        if e["event_id"] % 2 == 1 and wend <= wm_late:
            continue  # late odd row: its window closed under the filter
        surviving[ws] += 1
    want = {
        ws.strftime("%Y-%m-%d %H:%M:%S"): n
        for ws, n in surviving.items()
        if ws + dt.timedelta(hours=1) <= wm_final  # emitted (closed) windows
    }
    got = {
        r.window_start: r.n
        for r in E.queries()["stream_late_drop"](spark, SF).collect()
    }
    assert got == want
    # non-vacuity: some odd rows actually dropped, some windows emitted
    assert want and sum(want.values()) < sum(
        1 for e in ev
        if wstart(e["ts"]) + dt.timedelta(hours=1) <= wm_final
    )


# --------------------------------------------------------- stream_stream_join


def _range_pairs():
    ev = _rows("events")
    clicks = defaultdict(list)
    for e in ev:
        if e["event_type"] == "click":
            clicks[e["user_id"]].append(e)
    out = []
    hour = dt.timedelta(hours=1)
    for e in ev:
        if e["event_type"] != "purchase":
            continue
        for c in clicks.get(e["user_id"], ()):
            if e["ts"] - hour <= c["ts"] <= e["ts"]:
                out.append((e["event_id"], c["event_id"]))
    return out


def test_stream_stream_join_matches_batch_range_join(spark):
    want = sorted(_range_pairs())
    got = [
        (r.purchase_id, r.click_id)
        for r in E.queries()["stream_stream_join"](spark, SF).collect()
    ]
    assert got == want


def test_stream_outer_join_emits_exact_unmatched_set(spark):
    pairs = _range_pairs()
    matched = {p for p, _ in pairs}
    ev = _rows("events")
    want = sorted(
        pairs
        + [
            (e["event_id"], -1)
            for e in ev
            if e["event_type"] == "purchase" and e["event_id"] not in matched
        ]
    )
    got = [
        (r.purchase_id, r.click_id)
        for r in E.queries()["stream_outer_join"](spark, SF).collect()
    ]
    assert got == want
