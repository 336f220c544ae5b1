"""Law-test backfill, batch 3: the r4 block that enters the r11
certification window (ROADMAP r11 rotation plan) — pure-Python /
closed-form references and internal-consistency identities, never the
oracle SQL.

Covers: spearman_corr (min-rank reference; the r10 session found and
fixed a WHERE-filter drift in its SQL twin — this test pins the Spark
semantics independently), robust_zscore (lower-median/MAD reference),
cube_revenue (CUBE marginal identities + python total), sliding_windows
(every event lands in exactly two windows), user_trend_slope (OLS
reference + constant-series law), set_ops_users (set-algebra
identities), url_canonicalize (python urllib-free canonicalizer)."""

from __future__ import annotations

import datetime as dt
import json
import math
from collections import defaultdict
from decimal import Decimal

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


# ------------------------------------------------------------ spearman_corr


def _min_rank(vals):
    """SQL rank(): 1 + number of STRICTLY smaller values."""
    s = sorted(vals)
    import bisect

    return [bisect.bisect_left(s, v) + 1 for v in vals]


def test_spearman_matches_min_rank_reference(spark):
    got = {
        r.event_type: (r.n, r.spearman)
        for r in E.queries()["spearman_corr"](spark, SF).collect()
    }
    groups = defaultdict(list)
    for r in _events():
        k = json.loads(r["props"]).get("k")
        groups[r["event_type"]].append((float(r["value"]), int(k)))
    assert set(got) == set(groups)
    for et, rows in groups.items():
        rx = _min_rank([v for v, _ in rows])
        ry = _min_rank([k for _, k in rows])
        n = len(rows)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        rho = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(rho, abs=1e-3), et


# ------------------------------------------------------------ robust_zscore


def test_robust_zscore_median_mad_reference(spark):
    got = {
        r.event_type: (r.n, r.med, r.mad, r.n_outliers)
        for r in E.queries()["robust_zscore"](spark, SF).collect()
    }
    groups = defaultdict(list)
    for r in _events():
        groups[r["event_type"]].append((float(r["value"]), r["event_id"]))
    for et, rows in groups.items():
        n = len(rows)
        med = sorted(rows)[(n + 1) // 2 - 1][0]  # exact lower median
        devs = sorted((abs(v - med), eid) for v, eid in rows)
        mad = devs[(n + 1) // 2 - 1][0]
        outliers = sum(1 for d, _ in devs if d > mad * 4.4478)
        assert got[et][0] == n
        assert got[et][1] == pytest.approx(med, abs=1e-3), et
        assert got[et][2] == pytest.approx(mad, abs=1e-3), et
        assert got[et][3] == outliers, et


# ------------------------------------------------------------- cube_revenue


def test_cube_marginal_identities_and_total(spark):
    rows = {
        (r.nation, r.yr): (r.revenue, r.n_items)
        for r in E.queries()["cube_revenue"](spark, SF).collect()
    }
    nations = {n for n, y in rows if n != "ALL"}
    years = {y for n, y in rows if y != -1}
    # n_items identities are EXACT integers
    for nat in nations:
        assert rows[(nat, -1)][1] == sum(
            rows[(nat, y)][1] for y in years if (nat, y) in rows
        ), nat
    for y in years:
        assert rows[("ALL", y)][1] == sum(
            rows[(n, y)][1] for n in nations if (n, y) in rows
        ), y
    assert rows[("ALL", -1)][1] == sum(
        rows[(n, y)][1] for n in nations for y in years if (n, y) in rows
    )
    # revenue marginals to 4dp-sum tolerance (each cell rounded to 1e-4)
    for nat in nations:
        cells = [rows[(nat, y)][0] for y in years if (nat, y) in rows]
        assert rows[(nat, -1)][0] == pytest.approx(
            sum(cells), abs=1e-4 * (len(cells) + 1)
        ), nat
    # grand total vs an exact python Decimal recomputation
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_extendedprice", "l_discount"]
    )
    tot = sum(
        Decimal(str(p)) * (Decimal(1) - Decimal(str(d)))
        for p, d in zip(
            li.column("l_extendedprice").to_pylist(),
            li.column("l_discount").to_pylist(),
        )
    )
    assert rows[("ALL", -1)][0] == pytest.approx(float(tot), abs=1e-2)


# ---------------------------------------------------------- sliding_windows


def test_sliding_windows_double_counting_law(spark):
    out = E.queries()["sliding_windows"](spark, SF).collect()
    evs = _events()
    assert sum(r.n for r in out) == 2 * len(evs)
    exp_total = 2 * sum(round(float(r["value"]), 4) for r in evs)
    assert sum(r.total for r in out) == pytest.approx(exp_total, abs=0.01)
    # every event's hour and hour-1 must appear as window starts for its type
    starts = {(r.win_start, r.event_type) for r in out}
    for r in evs[:200]:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        for w0 in (h, h - dt.timedelta(hours=1)):
            assert (w0.strftime("%Y-%m-%d %H:%M:%S"), r["event_type"]) in starts


# --------------------------------------------------------- user_trend_slope


def test_user_trend_slope_ols_reference(spark):
    got = {
        r.user_id: (r.n_days, r.slope_per_day)
        for r in E.queries()["user_trend_slope"](spark, SF).collect()
    }
    daily = defaultdict(int)
    for r in _events():
        d = r["ts"].date()
        daily[(r["user_id"], d)] += math.floor(float(r["value"]) * 1e6 + 0.5)
    per_user = defaultdict(list)
    for (u, d), y in daily.items():
        per_user[u].append(((d - dt.date(2024, 1, 1)).days, y))
    exp = {}
    for u, pts in per_user.items():
        n = len(pts)
        if n < 2:
            continue
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        exp[u] = (n, (n * sxy - sx * sy) / (n * sxx - sx * sx) / 1e6)
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0]
        assert got[u][1] == pytest.approx(exp[u][1], abs=1e-3), u


def test_trend_slope_constant_series_is_zero(spark):
    # closed form on a crafted frame through the same OLS sums
    import pyspark.sql.functions as F

    daily = [(1, x, 5_000_000) for x in range(10)]
    df = spark.createDataFrame(daily, "user_id int, x long, y long")
    agg = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    row = agg.collect()[0]
    assert row.n * row.sxy - row.sx * row.sy == 0


# ------------------------------------------------------------ set_ops_users


def test_set_ops_algebra_identities(spark):
    got = {
        r.op: r.n_users for r in E.queries()["set_ops_users"](spark, SF).collect()
    }
    clickers, purch = set(), set()
    for r in _events():
        if r["event_type"] == "click":
            clickers.add(r["user_id"])
        elif r["event_type"] == "purchase":
            purch.add(r["user_id"])
    assert got == {
        "clickers": len(clickers),
        "purchasers": len(purch),
        "converted": len(clickers & purch),
        "browsed_only": len(clickers - purch),
        "direct_buyers": len(purch - clickers),
    }
    assert got["converted"] + got["browsed_only"] == got["clickers"]
    assert got["converted"] + got["direct_buyers"] == got["purchasers"]


# ---------------------------------------------------------- url_canonicalize


def _canon_py(doc_id: int, source: str):
    url = (
        f"HTTPS://WWW.Example{doc_id % 7}.COM/Path/{source}/{doc_id}"
        + ("/" if doc_id % 4 == 0 else "")
        + f"?id={doc_id % 5}"
        + ("&utm_source=feed" if doc_id % 3 == 0 else "")
        + ("&utm_campaign=x&ref=r" if doc_id % 3 == 1 else "")
        + ("#frag" if doc_id % 2 == 0 else "")
    )
    rest = url.split("://", 1)[1]
    no_frag = rest.split("#", 1)[0]
    hostpath = no_frag.split("?", 1)[0]
    host = hostpath.split("/", 1)[0].lower()
    path = "/" + hostpath.split("/", 1)[1] if "/" in hostpath else ""
    path = path.rstrip("/")  # r12 pinned rule: collapse ALL trailing slashes
    q = no_frag.split("?", 1)[1] if "?" in no_frag else ""
    keep = "&".join(p for p in q.split("&") if p and not p.startswith("utm_"))
    return host, f"https://{host}{path}" + (f"?{keep}" if keep else "")


def test_url_canonicalize_matches_python(spark):
    got = {
        r.host: (r.n_urls, r.n_canonical, r.sample_canon)
        for r in E.queries()["url_canonicalize"](spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    per_host = defaultdict(list)
    for did, src in zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()):
        h, c = _canon_py(did, src)
        per_host[h].append(c)
    exp = {
        h: (len(cs), len(set(cs)), min(cs)) for h, cs in per_host.items()
    }
    assert got == exp
