"""Per-query evidence ledger invariants (VERDICT r10 #1).

The ledger (scripts/ledger.py + scripts/query_ledger.json) replaces
rotation.py's file-granular staleness with a per-query identity hash:
callable source + transitive in-package helpers/constants + oracle
SQL.  These tests pin the properties the rotation gate leans on — no
SparkSession needed (queries() returns plain callables)."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import ledger  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


@pytest.fixture(scope="module")
def registry():
    return entry.queries(), entry.oracle_sql()


def test_every_oracle_backed_query_hashes(registry):
    qs, oracles = registry
    hashes = {
        n: ledger.query_hash(qs[n], oracles[n]) for n in qs if n in oracles
    }
    assert len(hashes) == len(oracles)
    assert all(len(h) == 64 for h in hashes.values())


def test_hash_is_deterministic(registry):
    qs, oracles = registry
    name = sorted(oracles)[0]
    assert ledger.query_hash(qs[name], oracles[name]) == ledger.query_hash(
        qs[name], oracles[name]
    )


def test_hash_sensitive_to_oracle_text(registry):
    qs, oracles = registry
    name = sorted(oracles)[0]
    a = ledger.query_hash(qs[name], oracles[name])
    b = ledger.query_hash(qs[name], oracles[name] + " -- touched")
    assert a != b


def test_hash_sensitive_to_callable_source():
    # two distinct local callables must hash apart under the same oracle
    def q_one(spark, sf):
        return 1

    def q_two(spark, sf):
        return 2

    assert ledger.query_hash(q_one, "SELECT 1") != ledger.query_hash(
        q_two, "SELECT 1"
    )


def test_hash_covers_in_package_helpers(registry):
    """The walk must reach named helpers — e.g. hll_distinct_users'
    hash parts include hll_estimate/hll_registers (the helper whose
    r8 edit correctly re-staled the r7 bank)."""
    qs, _ = registry
    parts: dict[str, str] = {}
    ledger._collect_sources(qs["hll_distinct_users"], parts, set())
    keys = set(parts)
    assert any(k.endswith("sketches.hll_estimate") for k in keys)
    assert any(k.endswith("sketches.hll_registers") for k in keys)
    # constants it reads participate too
    assert any(k.startswith("const:") and "HLL_P" in k for k in keys)


def test_ledger_file_covers_registry_and_matches_schema(registry):
    qs, oracles = registry
    data = json.load(open(os.path.join(REPO, "scripts", "query_ledger.json")))
    for name, row in data.items():
        assert set(row) >= {"hash", "round"}, name
        assert name in oracles, f"ledger orphan: {name}"
    # every oracle-backed query whose banked round's artifact is
    # COMMITTED has a ledger row (`sync` extracts hashes from the
    # artifact commit's tree, so rows banked by a not-yet-committed
    # CORRECTNESS file are legitimately absent until the next sync)
    banked = ledger.banked_rounds()
    committed = {
        r: bool(ledger._artifact_commit(r)) for r in set(banked.values())
    }
    missing = [
        n for n in oracles
        if n not in data and n in banked and committed[banked[n]]
    ]
    assert not missing, f"unledgered oracle-backed queries: {sorted(missing)}"


def test_normalize_source_semantic_identity():
    """Hash v2 (r12): comments, docstrings, blank lines and formatting
    must not change a function's ledger identity — they were refilling
    the stale tier with evidence lag (13 of 44 r12 'stale' entries were
    comment-only drift) — while ANY token-level code change still must."""
    a = '''
def f(x):
    """Docstring."""
    # a comment
    y = x + 1

    return y
'''
    b = '''
def f(x):
    """Completely different docstring."""
    y = x + 1  # trailing comment, different spacing
    return y
'''
    c = '''
def f(x):
    y = x + 2
    return y
'''
    na, nb, nc = map(ledger._normalize_source, (a, b, c))
    assert na == nb
    assert na != nc
    # docstring-only bodies stay syntactically valid
    assert "pass" in ledger._normalize_source('def g():\n    """doc"""\n')
    # unparseable input falls back to the raw text, never hides a change
    broken = "def f(:\n    oops"
    assert ledger._normalize_source(broken) == broken


def test_ledger_entries_carry_hash_version():
    data = json.load(open(os.path.join(REPO, "scripts", "query_ledger.json")))
    assert data, "empty ledger"
    assert all(row.get("v") == ledger.HASH_VERSION for row in data.values())
