"""Plan-fingerprint staleness guard (VERDICT r9 Next-round #5).

A query whose physical plan changed since its last driver-green round must
re-earn a driver row: it has to sit INSIDE the first-50 verification window
of __spark_entry__. This test makes that mechanical instead of builder
discipline. The ledger (docs/plan_attest.json) is regenerated per round by
``python tools/plan_ledger.py build`` from git history + CORRECTNESS files.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.plan_ledger import _plans_rows, violations  # noqa: E402

ATTEST = "/root/repo/docs/plan_attest.json"
PLANS = "/root/repo/docs/PLANS.md"


def _window() -> list[str]:
    import __spark_entry__ as entrymod

    return entrymod._DRIVER_WINDOW_PRIORITY[:50]


def test_stale_plan_queries_are_inside_driver_window():
    """Every hash query whose current PLANS.md row differs from the row at
    its newest driver-green round (or that has no driver row yet) must be
    inside the first-50 window so the next driver round re-attests it."""
    att = json.load(open(ATTEST))["queries"]
    bad = [v for v in violations(attested=att) if v not in _window()]
    assert bad == [], (
        f"plan changed since last driver-green round but query is outside "
        f"the first-50 driver window: {bad} — add to the top of "
        f"_DRIVER_WINDOW_PRIORITY or re-earn a driver row"
    )


def test_guard_detects_synthetic_plan_edit():
    """The mechanism itself: tampering one non-windowed query's row in a
    synthetic PLANS.md must produce a violation for exactly that query."""
    att = json.load(open(ATTEST))["queries"]
    window = set(_window())
    current = open(PLANS).read()
    rows = _plans_rows(current)
    victim = next(
        n for n in sorted(rows) if n in att and n not in window
        and att[n].get("row") == rows[n]
    )
    # bump the exchanges cell (first numeric column) — a synthetic shuffle
    # regression in an otherwise-valid row
    import re

    tampered_row = re.sub(r"\| (\d+) \|", "| 999 |", rows[victim], count=1)
    assert tampered_row != rows[victim]
    tampered = current.replace(rows[victim], tampered_row)
    base = set(violations(attested=att, current_plans=current))
    got = set(violations(attested=att, current_plans=tampered))
    assert victim not in base
    assert got == base | {victim}


def test_ledger_covers_every_attested_hash_query():
    """Ledger hygiene: every hash query with a driver-green row has an
    attested PLANS.md fingerprint (no None rows — PLANS.md has existed at
    every green round since r4)."""
    att = json.load(open(ATTEST))["queries"]
    assert att, "empty ledger — run: python tools/plan_ledger.py build"
    missing = [n for n, v in att.items() if not v.get("row")]
    assert missing == [], missing
