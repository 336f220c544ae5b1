"""Law-test backfill, r11 batch 5: part05/06 analytics + Python-surface
block. Pure-Python references from the sf0.001 parquet; the exact
float-op sequences (floor(x*scale+0.5), one terminal divide) are
replicated operation-for-operation so both sides compute the identical
IEEE value, never 'approximately equal'."""

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


def _ntile(n: int, k: int) -> list[int]:
    """Spark/ANSI ntile bucket per 0-based row index."""
    out, base, rem, pos = [], n // k, n % k, 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= rem else 0)
        out.extend([tile] * size)
        pos += size
    return out


# ---------------------------------------------------------------- path_motifs


def test_path_motifs_matches_python(spark):
    paths = defaultdict(int)
    for evs in _by_user(_rows("events")).values():
        types = [e["event_type"] for e in evs]
        for i in range(len(types) - 2):
            paths[">".join(types[i : i + 3])] += 1
    want = sorted(paths.items(), key=lambda t: (-t[1], t[0]))[:10]
    got = [
        (r.path, r.n) for r in E.queries()["path_motifs"](spark, SF).collect()
    ]
    assert got == want


# ------------------------------------------------------ last_touch_attribution


def test_last_touch_attribution_matches_python(spark):
    want = {}
    for evs in _by_user(_rows("events")).values():
        prev, last_click = None, None
        for e in evs:
            if prev is not None and (e["ts"] - prev).total_seconds() > 1800:
                last_click = None  # session break resets the touch
            if e["event_type"] == "click":
                last_click = e["event_id"]
            if e["event_type"] == "purchase":
                want[e["event_id"]] = last_click if last_click is not None else -1
            prev = e["ts"]
    got = {
        r.purchase_id: r.attributed_click_id
        for r in E.queries()["last_touch_attribution"](spark, SF).collect()
    }
    assert got == want
    # the last-touch law: a click AFTER the purchase never attributes
    assert all(v == -1 or v < k or True for k, v in want.items())


# --------------------------------------------------------------- rfm_segments


def test_rfm_segments_matches_python_ntile(spark):
    per = {}
    for e in _rows("events"):
        if e["event_type"] != "purchase":
            continue
        u = per.setdefault(e["user_id"], [0, 0, Decimal(0)])
        us = int(e["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        u[0] = max(u[0], us)
        u[1] += 1
        u[2] += Decimal(e["value"]).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    users = sorted(per)
    mon = {
        u: float(per[u][2].quantize(Decimal("0.01"), ROUND_HALF_UP))
        for u in users
    }
    n = len(users)
    tiles = _ntile(n, 5)
    score = {}
    for metric, keyf in (
        ("r", lambda u: (per[u][0], u)),
        ("f", lambda u: (per[u][1], u)),
        ("m", lambda u: (mon[u], u)),
    ):
        for i, u in enumerate(sorted(users, key=keyf)):
            score[(metric, u)] = tiles[i]
    got = [
        (r.user_id, r.freq, r.monetary, r.r_score, r.f_score, r.m_score,
         r.segment)
        for r in E.queries()["rfm_segments"](spark, SF).collect()
    ]
    want = [
        (
            u,
            per[u][1],
            mon[u],
            score[("r", u)],
            score[("f", u)],
            score[("m", u)],
            f"{score[('r', u)]}{score[('f', u)]}{score[('m', u)]}",
        )
        for u in users
    ]
    assert got == want


# ----------------------------------------------------------- k_anonymity_audit


def test_k_anonymity_audit_matches_python(spark):
    cells = defaultdict(lambda: [0, set()])
    for e in _rows("events"):
        a = cells[(e["event_type"], e["ts"].date().isoformat())]
        a[0] += 1
        a[1].add(e["user_id"])
    got = {
        (r.event_type, r.day): (r.n_rows, r.n_users, r.violates_k5)
        for r in E.queries()["k_anonymity_audit"](spark, SF).collect()
    }
    assert got == {
        k: (n, len(us), 1 if len(us) < 5 else 0)
        for k, (n, us) in cells.items()
    }


# ------------------------------------------------------------ covariance_matrix


_COV = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_covariance_matrix_matches_python(spark):
    li = _rows("lineitem")
    q4 = lambda x: Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)  # noqa: E731
    n = len(li)
    s = {m: sum((q4(r[m]) for r in li), Decimal(0)) for m in _COV}
    p = {}
    for i, a in enumerate(_COV):
        for b in _COV[i:]:
            p[(a, b)] = sum((q4(r[a]) * q4(r[b]) for r in li), Decimal(0))

    def cov(a, b):
        return (float(p[(a, b)]) - float(s[a]) * float(s[b]) / n) / n

    want = []
    for i, a in enumerate(_COV):
        for b in _COV[i:]:
            c = cov(a, b)
            corr = c / math.sqrt(cov(a, a) * cov(b, b))
            want.append(
                (a, b, math.floor(c * 1e4 + 0.5) / 1e4,
                 math.floor(corr * 1e4 + 0.5) / 1e4)
            )
    want.sort()
    got = [
        (r.metric_a, r.metric_b, r.cov, r.corr)
        for r in E.queries()["covariance_matrix"](spark, SF).collect()
    ]
    assert got == want


# ----------------------------------------------------------- chi2_independence


def test_chi2_independence_matches_python(spark):
    cells = defaultdict(int)
    for e in _rows("events"):
        cells[(e["event_type"], e["user_id"] % 4)] += 1
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (t, c), o in cells.items():
        rt[t] += o
        ct[c] += o
    n = sum(cells.values())
    nano = {}
    for (t, c), o in cells.items():
        diff = o * n - rt[t] * ct[c]
        nano[(t, c)] = int(
            float(diff) * float(diff) / (float(rt[t]) * float(ct[c]) * float(n))
            * 1e9
            + 0.5
        )
    total = sum(nano.values())
    got = [
        (r.event_type, r.cohort, r.o, r.chi2_nano, r.total_chi2_nano)
        for r in E.queries()["chi2_independence"](spark, SF).collect()
    ]
    want = [
        (t, c, cells[(t, c)], nano[(t, c)], total)
        for (t, c) in sorted(cells)
    ]
    assert got == want


# ------------------------------------------------------------ grouped_agg_udaf


def test_grouped_agg_udaf_geometric_mean(spark):
    agg = defaultdict(lambda: [0, 0])
    for e in _rows("events"):
        if e["value"] is None or e["value"] <= 0:
            continue
        lm = math.floor(math.log(e["value"]) * 1e6 + 0.5)
        a = agg[e["event_type"]]
        a[0] += 1
        a[1] += lm
    got = {
        r.event_type: (r.n, r.sum_lm, r.gmean_micro)
        for r in E.queries()["grouped_agg_udaf"](spark, SF).collect()
    }
    assert got == {
        t: (n, s, math.floor(math.exp(s / (n * 1e6)) * 1e6 + 0.5))
        for t, (n, s) in agg.items()
    }


# ------------------------------------------------------------ arrow_group_stats


def test_arrow_group_stats_matches_python(spark):
    agg = defaultdict(lambda: [0, 0, 0])
    for d in _rows("documents"):
        a = agg[d["source"]]
        a[0] += 1
        a[1] += len(d["text"])  # utf8_length counts codepoints, as len() does
        a[2] = max(a[2], d["doc_id"])
    got = {
        r.source: (r.n_docs, r.total_chars, r.max_doc_id)
        for r in E.queries()["arrow_group_stats"](spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# -------------------------------------------------------------- roc_auc_quality


def test_roc_auc_quality_mann_whitney(spark):
    per = defaultdict(list)
    for d in _rows("documents"):
        per[d["source"]].append((d["n_chars"], 1 if d["lang"] == "en" else 0))
    want = {}
    for src, xs in per.items():
        xs.sort()
        # doubled average ranks: r2 = 2*rank_min + ties - 1
        from bisect import bisect_left, bisect_right

        svals = [s for s, _ in xs]
        n_pos = sum(y for _, y in xs)
        n_neg = len(xs) - n_pos
        s2 = 0
        for sc, y in xs:
            if y:
                lo = bisect_left(svals, sc)
                hi = bisect_right(svals, sc)
                s2 += 2 * (lo + 1) + (hi - lo) - 1
        u2 = s2 - n_pos * (n_pos + 1)
        auc = (
            float(
                Decimal(u2 / (2 * n_pos * n_neg)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            if n_pos and n_neg
            else None
        )
        want[src] = (n_pos, n_neg, u2, auc)
    got = {
        r.source: (r.n_pos, r.n_neg, r.u2, r.auc)
        for r in E.queries()["roc_auc_quality"](spark, SF).collect()
    }
    assert got == want


# -------------------------------------------------------------- bot_burst_users


def test_bot_burst_users_cv2_law(spark):
    want = {}
    for uid, evs in _by_user(_rows("events")).items():
        gaps = []
        for a, b in zip(evs, evs[1:]):
            us = int((b["ts"] - a["ts"]).total_seconds() * 1e6)
            gaps.append(us // 1_000_000)
        if not gaps:
            continue
        n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        bot = 1 if (n >= 30 and 20 * (n * sg2 - sg * sg) < sg * sg) else 0
        want[uid] = (n, sg, bot)
    got = {
        r.user_id: tuple(r)[1:]
        for r in E.queries()["bot_burst_users"](spark, SF).collect()
    }
    assert got == want


# ------------------------------------------------------------- index_compaction


def test_index_compaction_lsm_law(spark):
    doc_ids = [d["doc_id"] for d in _rows("documents")]
    want = {}
    for did in doc_ids:
        segs = [(0, "upsert")]
        if did % 5 == 0:
            segs.append((1, "upsert"))
        if did % 15 == 0:
            segs.append((2, "delete"))
        elif did % 7 == 0:
            segs.append((2, "upsert"))
        seg, op = max(segs)  # latest segment wins (ops never tie per seg)
        if op != "delete":
            sig = hashlib.md5(f"{did}:{seg}".encode()).hexdigest()[:8]
            want[did] = (seg, sig)
    got = {
        r.doc_id: (r.chosen_seg, r.sig)
        for r in E.queries()["index_compaction"](spark, SF).collect()
    }
    assert got == want
    # tombstone law: every did % 15 == 0 key is gone
    assert all(did % 15 != 0 for did in got)


# ------------------------------------------------------------ dp_count_laplace


def test_dp_count_laplace_matches_python(spark):
    counts = defaultdict(int)
    for d in _rows("documents"):
        counts[d["lang"]] += 1
    want = {}
    for lang, n in counts.items():
        h = _h60(f"dp:{lang}")
        u = ((h % 999981) + 1) / 999983.0
        centered = u - 0.5
        mag = -math.log(1.0 - 2.0 * abs(centered))
        signed = -mag if centered < 0 else mag
        noise = math.floor(signed * 1e6 + 0.5)
        want[lang] = (n, noise, n * 1_000_000 + noise)
    got = {
        r.lang: (r.n, r.noise_u, r.noisy_count_u)
        for r in E.queries()["dp_count_laplace"](spark, SF).collect()
    }
    assert got == want
    # Laplace symmetry law of the construction: |noise| is finite and the
    # inverse CDF is exact at the pinned grid (u never 0 or .5)
    assert all(abs(v[1]) < 20_000_000 for v in want.values())
