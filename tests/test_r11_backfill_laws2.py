"""Law-test backfill, r11 batch 2: the part02 source/sink/sketch block.
Pure-Python references from the sf0.001 parquet; the source round-trip
queries (jsonl/csv/corrupt) get the LOSSLESSNESS law — their aggregate
over the re-read files must equal the same aggregate computed straight
off the parquet in Python, so any encode/decode drift (quoting, escapes,
schema coercion) fails here without any SQL engine involved."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

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


def _h60(s: str) -> int:
    """functions.text.hash64 twin: first 15 hex digits of md5."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _q4(x: float) -> Decimal:
    return Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)


def _round2(x) -> float:
    return float(Decimal(x).quantize(Decimal("0.01"), ROUND_HALF_UP))


# ------------------------------------------------------ incremental_ingest


def test_incremental_ingest_high_water_mark_law(spark):
    ev = _rows("events")
    cutoff = dt.datetime(2024, 1, 25)
    cursor = max(e["ts"] for e in ev if e["ts"] < cutoff)
    fresh = [e for e in ev if e["ts"] > cursor]
    agg = defaultdict(lambda: [0, dt.datetime.min])
    for e in fresh:
        a = agg[e["event_type"]]
        a[0] += 1
        a[1] = max(a[1], e["ts"])
    got = {
        r.event_type: (r.n_new, r.new_cursor)
        for r in E.queries()["incremental_ingest"](spark, SF).collect()
    }
    assert got == {
        t: (n, ts.strftime("%Y-%m-%d %H:%M:%S.%f")) for t, (n, ts) in agg.items()
    }
    # the law proper: nothing at-or-before the cursor is re-ingested, and
    # every strictly-later row is counted exactly once
    assert sum(n for n, _ in agg.values()) == len(fresh)


# -------------------------------------------------------- observed_ingest


def test_observed_ingest_counters_match_python(spark):
    ev = _rows("events")
    pat = re.compile(r"^\{.*\}$")
    n_bad = sum(
        1 for e in ev if e["props"] is None or not pat.search(e["props"])
    )
    n_null = sum(1 for e in ev if e["value"] is None)
    row = E.queries()["observed_ingest"](spark, SF).collect()[0]
    assert (row.n_rows, row.n_bad, row.n_null_value, row.max_user_id) == (
        len(ev),
        n_bad,
        n_null,
        max(e["user_id"] for e in ev),
    )


# ------------------------------------------- jsonl_source / csv_source —
# the round-trip LOSSLESSNESS law: aggregates over the re-read files must
# equal the same aggregates computed straight off the parquet


def test_jsonl_source_roundtrip_lossless(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for d in _rows("documents"):
        a = agg[(d["source"], d["lang"])]
        a[0] += 1
        a[1] += d["n_chars"]
        a[2] += len(d["text"])
    got = {
        (r.source, r.lang): (r.n_docs, r.total_chars, r.total_text_len)
        for r in E.queries()["jsonl_source"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_csv_source_roundtrip_lossless(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for d in _rows("documents"):
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += d["n_chars"]
        a[2] += len(d["text"])
    got = {
        r.lang: (r.n_docs, r.total_chars, r.total_text_len)
        for r in E.queries()["csv_source"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# ------------------------------------------------- corrupt_record_routing


def test_corrupt_record_routing_matches_construction(spark):
    routes = defaultdict(lambda: [0, 0])
    for d in _rows("documents"):
        if d["doc_id"] % 13 == 0:  # truncated mid-record -> dead letter
            routes["__dead_letter__"][0] += 1
        else:
            a = routes[d["source"]]
            a[0] += 1
            a[1] += 1
    got = {
        r.route: (r.n, r.n_good)
        for r in E.queries()["corrupt_record_routing"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in routes.items()}


# -------------------------------------------------------- temperature_mix


def test_temperature_mix_matches_python_hash_sampler(spark):
    docs = _rows("documents")
    shares = defaultdict(int)
    for d in docs:
        shares[d["source"]] += 1
    n_tot = sum(shares.values())
    w_tot = sum(n**0.5 for n in shares.values())
    thresh = {
        s: int(
            Decimal(
                min(1.0, 0.5 * n_tot * (n**0.5) / (w_tot * n)) * 1_000_000
            ).quantize(Decimal("1"), ROUND_HALF_UP)
        )
        for s, n in shares.items()
    }
    want = sorted(
        (d["doc_id"], d["source"])
        for d in docs
        if _h60(f"mix:{d['doc_id']}") % 1_000_000 < thresh[d["source"]]
    )
    got = [
        (r.doc_id, r.source)
        for r in E.queries()["temperature_mix"](spark, SF).collect()
    ]
    assert got == want
    # law: α=0.5 upsampling keeps small-source rates >= large-source rates
    ordered = sorted(shares, key=shares.get)
    rates = [thresh[s] for s in ordered]
    assert rates == sorted(rates, reverse=True)


# -------------------------------------------------------- hll_merge_rollup


def _hll_estimate(ms: dict[int, int], m: int = 256) -> int:
    s = Fraction(0)
    for rho in ms.values():
        s += Fraction(1, 2**rho)
    zeros = m - len(ms)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / (float(s) + zeros)
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return math.floor(est + 0.5)


def test_hll_merge_rollup_matches_python_hll(spark):
    ev = _rows("events")
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    exact: dict[str, set] = defaultdict(set)
    for e in ev:
        h = _h60(str(e["user_id"]))
        idx, w = h % 256, h >> 8
        rho = 53 if w == 0 else 53 - w.bit_length()
        for key in (e["event_type"], "__total__"):
            regs[key][idx] = max(regs[key].get(idx, 0), rho)
            exact[key].add(e["user_id"])
    got = {
        r.event_type: (r.n_hll, r.n_exact)
        for r in E.queries()["hll_merge_rollup"](spark, SF).collect()
    }
    assert got == {
        k: (_hll_estimate(regs[k]), len(exact[k])) for k in regs
    }
    # mergeability law, stated directly: the __total__ registers ARE the
    # element-wise max of the per-type registers
    merged: dict[int, int] = {}
    for k, r in regs.items():
        if k == "__total__":
            continue
        for i, v in r.items():
            merged[i] = max(merged.get(i, 0), v)
    assert merged == regs["__total__"]


# --------------------------------------------------- grouping_sets_revenue


def test_grouping_sets_matches_python(spark):
    li = _rows("lineitem")
    sets = {  # gid -> key function
        0: lambda r: (r["l_returnflag"], r["l_linestatus"]),
        1: lambda r: (r["l_returnflag"], "__all__"),
        2: lambda r: ("__all__", r["l_linestatus"]),
        3: lambda r: ("__all__", "__all__"),
    }
    agg = defaultdict(lambda: [Decimal(0), 0])
    for r in li:
        rev = _q4(r["l_extendedprice"] * (1 - r["l_discount"]))
        for gid, keyf in sets.items():
            a = agg[(gid, *keyf(r))]
            a[0] += rev
            a[1] += 1
    want = [
        (rf, ls, gid, _round2(v), n)
        for (gid, rf, ls), (v, n) in sorted(
            agg.items(), key=lambda t: (t[0][0], t[0][1], t[0][2])
        )
    ]
    got = [
        (r.returnflag, r.linestatus, r.gid, r.revenue, r.n)
        for r in E.queries()["grouping_sets_revenue"](spark, SF).collect()
    ]
    assert got == want
