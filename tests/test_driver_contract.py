"""Driver-contract invariants: the verification-window ordering in
__spark_entry__ is the driver's hash-check budget — regressions here
silently unverify queries."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as contract


def test_registry_complete_and_oracled():
    q = contract.queries()
    o = contract.oracle_sql()
    assert len(q) >= 99
    missing = [k for k in q if k not in o]
    # difflib fuzzy scoring is the single documented rows-only entry
    assert missing == ["fuzzy_resolve_suppliers"]
    assert set(o) <= set(q)


def test_window_prioritizes_unverified_entries():
    names = list(contract.queries())
    window = names[:50]
    # every never-driver-checked entry must be inside the 50-entry window
    for k in contract._NEVER_DRIVER_CHECKED:
        assert k in window, k
    # round-2 red rows must be re-verified this round
    for k in contract._R2_RED:
        assert k in window, k
    # nothing is dropped or duplicated by the ordering
    assert len(names) == len(set(names))
    merged = set(contract.QUERIES) | set(contract.EXT_QUERIES) | set(
        contract.SQL2_QUERIES
    )
    assert set(names) == merged
