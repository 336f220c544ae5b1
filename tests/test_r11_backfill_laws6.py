"""Law-test backfill, r11 batch 6 (mop-up): the remaining oracle-only
queries — blocked n-gram Jaccard, per-nation Gini, the KMV set-overlap
sketch, and the five streaming queries, whose law IS streamed ≡ batch:
the memory-sink result of each availableNow streaming job must equal a
pure-Python batch recompute over the same parquet."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
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


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _by_user(events):
    per = defaultdict(list)
    for e in events:
        per[e["user_id"]].append(e)
    for v in per.values():
        v.sort(key=lambda e: (e["ts"], e["event_id"]))
    return per


# ---------------------------------------------------------------- ngram_jaccard


def test_ngram_jaccard_matches_python(spark):
    docs = _rows("documents")
    sh = {}
    for d in docs:
        toks = [t for t in d["text"].lower().split(" ") if t]
        sh[(d["lang"], d["doc_id"])] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    want = {}
    by_lang = defaultdict(list)
    for (lang, did), s in sh.items():
        if s:
            by_lang[lang].append((did, s))
    for pairs in by_lang.values():
        pairs.sort()
        for i, (a, sa) in enumerate(pairs):
            for b, sb in pairs[i + 1 :]:
                inter = len(sa & sb)
                if inter == 0:
                    continue
                jac = float(
                    Decimal(inter / (len(sa) + len(sb) - inter)).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                if jac >= 0.5:
                    want[(a, b)] = jac
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in E.queries()["ngram_jaccard"](spark, SF).collect()
    }
    assert got == want
    assert want  # the corpus plants near-dup twins — non-vacuous


# ----------------------------------------------------------- gini_concentration


def test_gini_concentration_matches_python(spark):
    cents = defaultdict(int)
    for o in _rows("orders"):
        cents[o["o_custkey"]] += int(
            math.floor(o["o_totalprice"] * 100.0 + 0.5)
        )
    cnat = {c["c_custkey"]: c["c_nationkey"] for c in _rows("customer")}
    nname = {n["n_nationkey"]: n["n_name"] for n in _rows("nation")}
    per_nation = defaultdict(list)
    for ck, y in cents.items():
        if ck in cnat:
            per_nation[nname[cnat[ck]]].append((y, ck))
    want = {}
    for nat, ys in per_nation.items():
        ys.sort()
        n = len(ys)
        s = sum(y for y, _ in ys)
        iy = sum((i + 1) * y for i, (y, _) in enumerate(ys))
        num = 2 * iy - (n + 1) * s
        gini = float(
            Decimal(num / (n * s)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        want[nat] = (n, s, num, gini)
    got = {
        r.nation: (r.n, r.s, r.g_num, r.gini)
        for r in E.queries()["gini_concentration"](spark, SF).collect()
    }
    assert got == want


# --------------------------------------------------------------- kmv_set_overlap


def test_kmv_set_overlap_matches_python(spark):
    K = 64
    sets = defaultdict(set)
    for e in _rows("events"):
        if e["event_type"] in ("click", "purchase"):
            sets[e["event_type"]].add(_h60(str(e["user_id"])))
    sk_a = set(sorted(sets["click"])[:K])
    sk_b = set(sorted(sets["purchase"])[:K])
    uk = sorted(sk_a | sk_b)[:K]
    m_union = len(uk)
    matches = sum(1 for h in uk if h in sk_a and h in sk_b)
    kth = max(uk)
    union_est = (
        m_union
        if m_union < K
        else int(math.floor(float((K - 1) * (1 << 60)) / float(kth)))
    )
    jac_micro = (matches * 1_000_000) // m_union
    inter_est = (matches * union_est) // m_union
    row = E.queries()["kmv_set_overlap"](spark, SF).collect()[0]
    assert (
        row.m_union, row.matches, row.jaccard_micro, row.union_est,
        row.inter_est,
    ) == (m_union, matches, jac_micro, union_est, inter_est)


# ------------------------------------------------- streamed ≡ batch (5 laws)


def test_stream_dedup_counts_exactly_once(spark):
    counts = defaultdict(int)
    for e in _rows("events"):
        counts[e["event_type"]] += 1
    got = {
        r.event_type: r.n
        for r in E.queries()["stream_dedup_counts"](spark, SF).collect()
    }
    assert got == dict(counts)  # the double-emitted replay fully collapses


def test_stream_wm_dedup_exactly_once(spark):
    counts = defaultdict(int)
    for e in _rows("events"):
        counts[e["event_type"]] += 1
    got = {
        r.event_type: r.n
        for r in E.queries()["stream_wm_dedup"](spark, SF).collect()
    }
    assert got == dict(counts)


def test_stream_state_reader_state_is_the_aggregate(spark):
    counts = defaultdict(int)
    for e in _rows("events"):
        counts[e["event_type"]] += 1
    got = {
        r.event_type: r.n
        for r in E.queries()["stream_state_reader"](spark, SF).collect()
    }
    assert got == dict(counts)


def test_stream_hourly_windows_matches_batch_python(spark):
    agg = defaultdict(lambda: [0, []])
    for e in _rows("events"):
        ws = e["ts"].replace(minute=0, second=0, microsecond=0)
        key = (ws.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])
        agg[key][0] += 1
        agg[key][1].append(e["value"])
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in E.queries()["stream_hourly_windows"](spark, SF).collect()
    }
    assert set(got) == set(agg)
    for k, (n, vals) in agg.items():
        gn, gv = got[k]
        assert gn == n
        # the value column is a float SUM (round(sum(value), 2)): the
        # reference bounds it to within one 2-dp step of the exact sum —
        # the exact-decimal variant is law-tested via hourly_windows
        assert abs(gv - sum(vals)) < 0.011


def test_stream_sessionize_matches_python(spark):
    gap = dt.timedelta(minutes=30)
    want = []
    for uid, evs in _by_user(_rows("events")).items():
        cur = None
        for e in evs:
            if cur is None or e["ts"] >= cur["end"]:
                if cur:
                    want.append(
                        (uid, cur["first"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                         cur["last"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                         cur["n"])
                    )
                cur = {"first": e["ts"], "last": e["ts"],
                       "end": e["ts"] + gap, "n": 0}
            cur["n"] += 1
            cur["last"] = e["ts"]
            cur["end"] = e["ts"] + gap
        if cur:
            want.append(
                (uid, cur["first"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                 cur["last"].strftime("%Y-%m-%d %H:%M:%S.%f"), cur["n"])
            )
    want.sort()
    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in E.queries()["stream_sessionize"](spark, SF).collect()
    ]
    assert got == want
