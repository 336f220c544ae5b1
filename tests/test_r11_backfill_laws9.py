"""Law-test backfill, r11 batch 9: queries surfaced by the ledger's
specificity pass (generic-helper citations rejected) — the profiling /
split / drift / temporal block, each against a pure-Python reference
from the sf0.001 parquet."""

from __future__ import annotations

import datetime as dt
import hashlib
import json
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


def _q4(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)


def _r4f(x: float) -> float:
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _r6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))


# -------------------------------------------------------- unpivot_part_metrics


def test_unpivot_part_metrics_matches_python(spark):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for p in _rows("part"):
        for metric, val in (
            ("p_retailprice", p["p_retailprice"]),
            ("p_size_d", float(p["p_size"])),
        ):
            a = agg[(p["p_brand"], metric)]
            a[0] += 1
            a[1] += _q4(val)
    got = {
        (r.p_brand, r.metric): (r.n, r.avg_val)
        for r in E.queries()["unpivot_part_metrics"](spark, SF).collect()
    }
    assert got == {
        k: (n, _r4f(float(s) / n)) for k, (n, s) in agg.items()
    }


# ---------------------------------------------------------- scd_point_in_time


def test_scd_point_in_time_matches_python(spark):
    orders = sorted(
        _rows("orders"), key=lambda o: (o["o_custkey"], o["o_orderdate"],
                                        o["o_orderkey"])
    )
    regimes = defaultdict(list)  # custkey -> [(from, to, prio)]
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o["o_custkey"]].append(o)
    for ck, os_ in by_cust.items():
        for i, o in enumerate(os_):
            to = os_[i + 1]["o_orderdate"] if i + 1 < len(os_) else None
            regimes[ck].append((o["o_orderdate"], to, o["o_orderpriority"]))
    okey = {o["o_orderkey"]: o["o_custkey"] for o in orders}
    agg = defaultdict(lambda: [0, Decimal(0)])
    for li in _rows("lineitem"):
        ck = okey.get(li["l_orderkey"])
        if ck is None:
            continue
        rev = _q4(li["l_extendedprice"]) * (Decimal(1).quantize(
            Decimal("0.0001")) - _q4(li["l_discount"]))
        for vf, vt, prio in regimes[ck]:
            if li["l_shipdate"] >= vf and (vt is None or li["l_shipdate"] < vt):
                a = agg[prio]
                a[0] += 1
                a[1] += rev
    got = {
        r.prio: (r.n_items, r.revenue)
        for r in E.queries()["scd_point_in_time"](spark, SF).collect()
    }
    assert got == {p: (n, _r4f(float(v))) for p, (n, v) in agg.items()}


# ----------------------------------------------------------- embedding_profile


def test_embedding_profile_matches_python(spark):
    per = defaultdict(list)
    for r in _rows("embeddings"):
        acc = 0.0
        for x in r["embedding"]:
            xd = float(x)
            acc = acc + xd * xd
        nu = math.floor(math.sqrt(acc) * 10_000.0 + 0.5)
        per[r["label"]].append((len(r["embedding"]), nu))
    got = {
        r.label: (r.n_vecs, r.n_dims, r.n_zero, r.min_norm, r.max_norm,
                  r.avg_norm)
        for r in E.queries()["embedding_profile"](spark, SF).collect()
    }
    want = {}
    for lab, xs in per.items():
        nus = [nu for _, nu in xs]
        want[lab] = (
            len(xs),
            len({d for d, _ in xs}),
            sum(1 for nu in nus if nu == 0),
            min(nus) / 10_000.0,
            max(nus) / 10_000.0,
            _r4f(float(sum(nus)) / len(xs) / 10_000.0),
        )
    assert got == want


# ------------------------------------------- dataset_split / stratified_split


def test_dataset_split_hash_law(spark):
    agg = defaultdict(int)
    for d in _rows("documents"):
        h = _h60(f"split:{d['doc_id']}") % 100
        s = "train" if h < 80 else ("val" if h < 90 else "test")
        agg[(d["lang"], s)] += 1
    got = {
        (r.lang, r.split): r.n_docs
        for r in E.queries()["dataset_split"](spark, SF).collect()
    }
    assert got == dict(agg)


def test_stratified_split_exact_rate_law(spark):
    per = defaultdict(list)
    for d in _rows("documents"):
        per[d["lang"]].append(
            (_h60(f"strat:{d['doc_id']}"), d["doc_id"])
        )
    want = {}
    for lang, xs in per.items():
        xs.sort()
        for rnk, (_, did) in enumerate(xs, 1):
            want[did] = (lang, "eval" if rnk % 5 == 0 else "train")
    got = {
        r.doc_id: (r.lang, r.split)
        for r in E.queries()["stratified_split"](spark, SF).collect()
    }
    assert got == want
    # EXACTLY floor(n/5) eval docs per stratum — the operator's contract
    for lang, xs in per.items():
        n_eval = sum(
            1 for did, (lg, s) in want.items() if lg == lang and s == "eval"
        )
        assert n_eval == len(xs) // 5


# ---------------------------------------------------------- embedding_outliers


def test_embedding_outliers_matches_python(spark):
    snapped = {
        r["vec_id"]: [
            math.floor(float(x) * 1_000_000.0 + 0.5) for x in r["embedding"]
        ]
        for r in _rows("embeddings")
    }
    dim = len(next(iter(snapped.values())))
    n = len(snapped)
    def tdiv(a, b):  # Spark `div` truncates toward zero; python // floors
        return -((-a) // b) if a < 0 else a // b

    cent = [
        tdiv(sum(v[i] for v in snapped.values()), n) for i in range(dim)
    ]
    d2 = {
        vid: sum((a - b) * (a - b) for a, b in zip(v, cent))
        for vid, v in snapped.items()
    }
    want = sorted(d2.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = [
        (r.vec_id, r.d2_u, r.dist)
        for r in E.queries()["embedding_outliers"](spark, SF).collect()
    ]
    assert got == [
        (vid, d, _r4f(math.sqrt(d / 1e12))) for vid, d in want
    ]


# -------------------------------------------------------------- token_kl_drift


def test_token_kl_drift_matches_python(spark):
    ca, cb = defaultdict(int), defaultdict(int)
    vocab = set()
    na = nb = 0
    for d in _rows("documents"):
        toks = [t for t in d["text"].lower().split(" ") if t]
        vocab.update(toks)
        if d["doc_id"] % 2 == 0:
            na += len(toks)
            for t in toks:
                ca[t] += 1
        else:
            nb += len(toks)
            for t in toks:
                cb[t] += 1
    v = len(vocab)
    want = {}
    for t, a in ca.items():
        b = cb.get(t, 0)
        ratio = (a * (nb + v)) / (na * (b + 1))
        kl = math.floor(1e6 * (a / na) * math.log(ratio) + 0.5)
        want[t] = (a, b, kl)
    got = {
        r.token: (r.cnt_a, r.cnt_b, r.kl_micro)
        for r in E.queries()["token_kl_drift"](spark, SF).collect()
    }
    assert got == want


# --------------------------------------------------------- holt_trend_forecast


def test_holt_trend_forecast_fold_law(spark):
    daily = defaultdict(lambda: defaultdict(Decimal))
    for e in _rows("events"):
        day = e["ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        daily[e["user_id"]][day] += _q4(e["value"])
    want = {}
    for uid, days in daily.items():
        series = [float(v) for _, v in sorted(days.items())]
        lvl, tr = series[0], 0.0
        for x in series[1:]:
            new_lvl = 0.5 * x + 0.5 * (lvl + tr)
            tr = 0.3 * (new_lvl - lvl) + 0.7 * tr
            lvl = new_lvl
        want[uid] = (
            len(series), _r4f(lvl), _r4f(tr), _r4f(lvl + 3.0 * tr)
        )
    got = {
        r.user_id: (r.n_days, r.level, r.trend, r.forecast_3)
        for r in E.queries()["holt_trend_forecast"](spark, SF).collect()
    }
    assert got == want


# ----------------------------------------------------------- containment_pairs


def _shingle_sets():
    out = {}
    for d in _rows("documents"):
        toks = [t for t in d["text"].lower().split(" ") if t]
        out[d["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    return out


def test_containment_pairs_directional_law(spark):
    sh = {k: v for k, v in _shingle_sets().items() if v}
    want = {}
    ids = sorted(sh)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            inter = len(sh[a] & sh[b])
            if inter and 10 * inter >= 9 * len(sh[a]):
                want[(a, b)] = (inter, len(sh[a]), len(sh[b]))
    got = {
        (r.id_sub, r.id_super): (r.n_shared, r.n_sub, r.n_super)
        for r in E.queries()["containment_pairs"](spark, SF).collect()
    }
    assert got == want


# ----------------------------------------------------------- ht_sampling_error


def test_ht_sampling_error_matches_python(spark):
    true_c = est_c = n_s = 0
    orders = _rows("orders")
    for o in orders:
        rc = math.floor(o["o_totalprice"] * 100.0 + 0.5)
        true_c += rc
        if _h60(f"ht:{o['o_orderkey']}") % 10 == 0:
            est_c += rc * 10
            n_s += 1
    row = E.queries()["ht_sampling_error"](spark, SF).collect()[0]
    assert (row.n_total, row.n_sample, row.true_cents, row.est_cents,
            row.err_ppm) == (
        len(orders), n_s, true_c, est_c,
        abs(est_c - true_c) * 1_000_000 // true_c,
    )


# ------------------------------------------------------------------- psi_drift


def test_psi_drift_matches_python(spark):
    cells = defaultdict(lambda: [0, 0])
    types = set()
    for e in _rows("events"):
        b = min(math.floor(e["value"] * 1_000_000.0 + 0.5) // 50_000_000, 9)
        types.add(e["event_type"])
        cells[(e["event_type"], b)][0 if e["event_id"] % 2 == 0 else 1] += 1
    want = {}
    for t in types:
        na = sum(cells[(t, b)][0] for b in range(10))
        nb = sum(cells[(t, b)][1] for b in range(10))
        tot = 0
        rows = {}
        for b in range(10):
            caa, cbb = cells[(t, b)]
            pa = (caa + 1) / (na + 10)
            pb = (cbb + 1) / (nb + 10)
            m = math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 0.5)
            rows[b] = (caa, cbb, m)
            tot += m
        for b, (caa, cbb, m) in rows.items():
            want[(t, b)] = (caa, cbb, m, tot)
    got = {
        (r.event_type, r.bin): (r.ca, r.cb, r.psi_micro, r.total_psi_micro)
        for r in E.queries()["psi_drift"](spark, SF).collect()
    }
    assert got == want


# ---------------------------------------------------------- join_size_estimate


def test_join_size_estimate_matches_python(spark):
    cl, co = defaultdict(int), defaultdict(int)
    for li in _rows("lineitem"):
        cl[li["l_orderkey"]] += 1
    for o in _rows("orders"):
        co[o["o_orderkey"]] += 1
    keys = set(cl) & set(co)
    true_p = sum(cl[k] * co[k] for k in keys)
    est_p = sum(
        cl[k] * co[k] * 20
        for k in keys
        if _h60(f"js:{k}") % 20 == 0
    )
    n_sk = sum(1 for k in keys if _h60(f"js:{k}") % 20 == 0)
    row = E.queries()["join_size_estimate"](spark, SF).collect()[0]
    assert (row.n_keys, row.n_sampled_keys, row.true_pairs, row.est_pairs,
            row.err_ppm) == (
        len(keys), n_sk, true_p, est_p,
        abs(est_p - true_p) * 1_000_000 // true_p,
    )


# ---------------------------------------------------------------- char_entropy


def test_char_entropy_matches_python(spark):
    want = {}
    for d in _rows("documents"):
        counts = defaultdict(int)
        for ch in d["text"].lower():
            if "a" <= ch <= "z":
                counts[ch] += 1
        n = sum(counts.values())
        ent = sum(-(c / n) * math.log(c / n) for c in sorted(counts.values()))
        e4 = _r4f(ent)
        want[d["doc_id"]] = (n, e4, 1 if (e4 < 2.0 or e4 > 4.8) else 0)
    got = {
        r.doc_id: (r.n_letters, r.entropy, r.flagged)
        for r in E.queries()["char_entropy"](spark, SF).collect()
    }
    assert got == want


# -------------------------------------------------------------- column_profile


_PROFILE = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_column_profile_matches_python(spark):
    li = _rows("lineitem")
    got = {
        r.col: (r.n_rows, r.n_null, r.n_distinct, r.min_val, r.max_val,
                r.mean_val)
        for r in E.queries()["column_profile"](spark, SF).collect()
    }
    for c in _PROFILE:
        vals = [r[c] for r in li if r[c] is not None]
        nr, nn, nd, mn, mx, mean = got[c]
        assert (nr, nn, nd) == (len(li), len(li) - len(vals), len(set(vals)))
        assert mn == float(Decimal(min(vals)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP))
        assert mx == float(Decimal(max(vals)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP))
        # float mean: partition sum order differs; the r4 snap absorbs it
        assert abs(mean - sum(vals) / len(vals)) < 2e-4


# ----------------------------------------------------------------- skew_report


def test_skew_report_matches_python(spark):
    counts = defaultdict(int)
    for e in _rows("events"):
        counts[e["user_id"]] += 1
    total = sum(counts.values())
    want = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = [
        (r.user_id, r.n, r.share)
        for r in E.queries()["skew_report"](spark, SF).collect()
    ]
    assert got == [(u, n, _r4f(n / total)) for u, n in want]


# ---------------------------------------------------------- winsorized_lengths


def _percentile(sorted_vals, p):
    """Spark/ANSI percentile(): linear interpolation at rank p*(n-1)."""
    r = p * (len(sorted_vals) - 1)
    lo = math.floor(r)
    hi = math.ceil(r)
    if lo == hi:
        return float(sorted_vals[lo])
    return sorted_vals[lo] + (r - lo) * (sorted_vals[hi] - sorted_vals[lo])


def test_winsorized_lengths_matches_python(spark):
    per = defaultdict(list)
    for d in _rows("documents"):
        per[d["lang"]].append(d["n_chars"])
    want = {}
    for lang, xs in per.items():
        s = sorted(xs)
        p05, p95 = _percentile(s, 0.05), _percentile(s, 0.95)
        clip = [min(max(float(x), p05), p95) for x in xs]
        want[lang] = (
            len(xs), _r4f(sum(xs) / len(xs)), _r4f(sum(clip) / len(clip))
        )
    got = {
        r.lang: (r.n_docs, r.mean_chars, r.wins_mean_chars)
        for r in E.queries()["winsorized_lengths"](spark, SF).collect()
    }
    for lang, (n, m, wm) in want.items():
        gn, gm, gwm = got[lang]
        assert gn == n and gm == m
        assert abs(gwm - wm) < 2e-4  # float sum order under the r4 snap


# --------------------------------------------------------------- weekly_growth


def test_weekly_growth_consistency_law(spark):
    weekly = defaultdict(float)
    for e in _rows("events"):
        if e["event_type"] != "purchase":
            continue
        wk = e["ts"] - dt.timedelta(days=e["ts"].weekday())
        wk = wk.replace(hour=0, minute=0, second=0, microsecond=0)
        weekly[wk.strftime("%Y-%m-%d")] += e["value"]
    got = [
        (r.week, r.wk_value, r.wow_change)
        for r in E.queries()["weekly_growth"](spark, SF).collect()
    ]
    assert [g[0] for g in got] == sorted(weekly)
    prev = None
    for wk, wv, wow in got:
        assert abs(wv - weekly[wk]) < 2e-4  # float sum order under r4
        # wow is internally consistent with the REPORTED wk values
        if prev is None or prev <= 0:
            assert wow is None or prev is None
        else:
            assert wow == _r4f((wv - prev) / prev)
        prev = wv


# ---------------------------------------------------------------- ngram_novelty


def test_ngram_novelty_first_seen_law(spark):
    sh = _shingle_sets()
    first = {}
    for did in sorted(sh):
        for s in sh[did]:
            first.setdefault(s, did)
    want = {}
    for did, ss in sh.items():
        n_sh = len(ss)
        n_nov = sum(1 for s in ss if first[s] == did)
        want[did] = (n_sh, n_nov, _r4f(n_nov / max(n_sh, 1)))
    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
        for r in E.queries()["ngram_novelty"](spark, SF).collect()
    }
    assert got == want
    # novelty is 1.0 for the first doc and the totals tile the vocab
    assert sum(n for _, n, _ in want.values()) == len(first)


# -------------------------------------------------------------- multimodal_meta


def test_multimodal_meta_matches_python(spark):
    want = {
        d["doc_id"]: (len(d["text"].encode("utf-8")), _h60(d["text"]))
        for d in _rows("documents")
    }
    got = {
        r.doc_id: (r.n_bytes, r.content_hash)
        for r in E.queries()["multimodal_meta"](spark, SF).collect()
    }
    assert got == want


# ---------------------------------------------------------------- props_extract


def test_props_extract_matches_python(spark):
    agg = defaultdict(list)
    n_all = defaultdict(int)
    for e in _rows("events"):
        n_all[e["event_type"]] += 1
        try:
            k = json.loads(e["props"]).get("k")
        except (TypeError, json.JSONDecodeError):
            k = None
        if k is not None:
            agg[e["event_type"]].append(int(k))
    got = {
        r.event_type: (r.n, r.sum_k, r.avg_k)
        for r in E.queries()["props_extract"](spark, SF).collect()
    }
    assert got == {
        t: (n_all[t], sum(ks), _r4f(sum(ks) / len(ks)))
        for t, ks in agg.items()
    }


# ------------------------------------------------------------ dup_span_fraction


def test_dup_span_fraction_matches_python(spark):
    spans = defaultdict(lambda: defaultdict(int))  # h -> doc -> cnt
    for d in _rows("documents"):
        toks = [t for t in d["text"].lower().split(" ") if t]
        for i in range(len(toks) - 12):
            g = " ".join(toks[i : i + 13])
            spans[_h60(g)][d["doc_id"]] += 1
    per = defaultdict(lambda: [0, 0])
    for h, docs in spans.items():
        nd = len(docs)
        for did, cnt in docs.items():
            per[did][0] += cnt
            if nd > 1:
                per[did][1] += cnt
    got = {
        r.doc_id: (r.n_spans, r.dup_frac)
        for r in E.queries()["dup_span_fraction"](spark, SF).collect()
    }
    assert got == {d: (n, _r6(dup / n)) for d, (n, dup) in per.items()}


# ------------------------------------------------------------------- vocab_topn


def test_vocab_topn_matches_python(spark):
    tf, df_ = defaultdict(int), defaultdict(set)
    for d in _rows("documents"):
        for t in d["text"].lower().split(" "):
            if t:
                tf[t] += 1
                df_[t].add(d["doc_id"])
    want = sorted(tf.items(), key=lambda t: (-t[1], t[0]))[:200]
    got = [
        (r.term, r.tf, r.df, r.rnk)
        for r in E.queries()["vocab_topn"](spark, SF).collect()
    ]
    assert got == [
        (t, n, len(df_[t]), i + 1) for i, (t, n) in enumerate(want)
    ]
