"""The per-round full-registry mimic sweep must be committed as an
artifact (MIMIC_r{N}.json, written by ``tools/oracle_check.py --json``)
and stay FRESH: its query set must exactly match the live registry, so
the judge can audit the non-driver-window queries without re-running the
sweep (VERDICT r4 item 6). A stale artifact — one missing newly-added
queries or naming deleted ones — fails here."""

import glob
import json
import os

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_mimic():
    paths = sorted(glob.glob(os.path.join(ROOT, "MIMIC_r*.json")))
    assert paths, "no MIMIC_r{N}.json artifact committed; run " \
        "`python tools/oracle_check.py --json MIMIC_r{N}.json`"
    return paths[-1]


def test_mimic_artifact_matches_registry():
    data = json.load(open(_latest_mimic()))
    swept = set(data["results"])
    live = set(E.queries())
    missing = live - swept
    stale = swept - live
    assert not missing, f"registry queries absent from mimic sweep: {sorted(missing)[:10]}"
    assert not stale, f"mimic sweep names queries no longer registered: {sorted(stale)[:10]}"


def test_mimic_artifact_all_green():
    data = json.load(open(_latest_mimic()))
    bad = {n: r for n, r in data["results"].items() if r["status"] == "fail"}
    assert not bad, f"mimic sweep failures committed: {bad}"


def test_mimic_rows_only_is_minority():
    """Oracle-paired coverage must stay total: rows-only entries (no DuckDB
    twin) are allowed only for genuinely non-SQL-expressible operators."""
    data = json.load(open(_latest_mimic()))
    rows_only = [n for n, r in data["results"].items() if r["status"] == "rows_only"]
    assert len(rows_only) <= 5, f"too many rows-only queries: {rows_only}"
