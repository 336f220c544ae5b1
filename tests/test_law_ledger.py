"""The law-ledger gate (r10-VERDICT item 2): law coverage is machine-
visible and complete. Every registry query must cite its independent law
evidence in tests/law_ledger.py, every citation must resolve to a real
test (function or file), and scaffolding files (plan gates, driver
contract, oracle parity) can never be passed off as laws."""

from __future__ import annotations

import ast
import glob
import os
import re

import __spark_entry__ as E
from tests.law_ledger import LAWS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: these check plans, driver contracts, or the oracle twin — NOT
#: independent semantics; citing them as laws is a ledger bug
NON_LAW_FILES = {
    "test_plan_hygiene.py",
    "test_entry_contract.py",
    "test_mimic_artifact.py",
    "test_plan_audit_physical.py",
    "test_oracle_check_dtype.py",
    "test_oracle_parity.py",
    "test_testdata_contract.py",
    "test_law_ledger.py",
}


def test_ledger_is_complete():
    registry = set(E.queries())
    assert set(LAWS) == registry, (
        f"unledgered: {sorted(registry - set(LAWS))}; "
        f"stale: {sorted(set(LAWS) - registry)}"
    )


def _test_functions(path: str) -> set[str]:
    tree = ast.parse(open(path).read())
    return {
        n.name
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name.startswith("test")
    }


def _package_operators() -> set[str]:
    ops = set()
    for f in glob.glob(
        os.path.join(ROOT, "ingestion_scripts_spark/**/*.py"), recursive=True
    ):
        tree = ast.parse(open(f).read())
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and not node.name.startswith(
                ("_", "q_", "sql_")
            ):
                ops.add(node.name)
    return ops


def test_every_citation_resolves():
    ops = _package_operators()
    bad = []
    for query, cite in LAWS.items():
        if cite.startswith("op:"):
            opname, fname = cite[3:].split(" ", 1)
            path = os.path.join(ROOT, "tests", fname)
            if fname in NON_LAW_FILES or not os.path.exists(path):
                bad.append((query, cite, "bad file"))
                continue
            if opname not in ops:
                bad.append((query, cite, "unknown operator"))
                continue
            if not re.search(r"\b" + re.escape(opname) + r"\b", open(path).read()):
                bad.append((query, cite, "file does not reference operator"))
        else:
            fname, tname = cite.split("::", 1)
            path = os.path.join(ROOT, "tests", fname)
            if fname in NON_LAW_FILES or not os.path.exists(path):
                bad.append((query, cite, "bad file"))
                continue
            if tname not in _test_functions(path):
                bad.append((query, cite, "missing test function"))
                continue
            src = open(path).read()
            if f'"{query}"' not in src and f"'{query}'" not in src:
                bad.append((query, cite, "test never names the query"))
    assert not bad, bad


def test_operator_citations_name_a_real_callee():
    """op:-level entries must cite an operator the query actually calls —
    a copy-paste citation of an unrelated operator is a ledger bug."""
    qsrc = {}
    sources = sorted(
        glob.glob(os.path.join(ROOT, "ingestion_scripts_spark/registry/part*.py"))
    ) + [os.path.join(ROOT, "__spark_entry__.py")]
    for f in sources:
        src = open(f).read()
        tree = ast.parse(src)
        for node in tree.body:
            if isinstance(node, ast.FunctionDef):
                qsrc[node.name] = ast.get_source_segment(src, node)
    qfn = {n: fn.__name__ for n, fn in E.queries().items()}
    bad = []
    for query, cite in LAWS.items():
        if not cite.startswith("op:"):
            continue
        opname = cite[3:].split(" ", 1)[0]
        body = qsrc.get(qfn[query], "")
        if not re.search(r"\b" + re.escape(opname) + r"\s*\(", body):
            bad.append((query, opname))
    assert not bad, bad
