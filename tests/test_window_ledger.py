"""Driver-window rotation guard (VERDICT r4 Next-round #8).

The correctness harness verifies only the FIRST 50 entries of queries().
Rounds 3 and 4 both ended with hash-oracled queries that had NEVER received
a driver CORRECTNESS row because they were registered below that window.
This test makes the failure mode structural: every hash-oracled query with
no green driver row in any git-tracked CORRECTNESS_r*.json MUST sit inside
the current window, so it is guaranteed a row on the next driver run. Adding
a new oracle query without front-loading it into _DRIVER_WINDOW_PRIORITY
fails here immediately.
"""

import glob
import json

DRIVER_WINDOW = 50


def _driver_green() -> set[str]:
    green = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                green.add(name)
    return green


def test_every_unverified_hash_query_is_in_window():
    import __spark_entry__ as e

    ordered = list(e.queries())
    oracles = e.oracle_sql()
    window = set(ordered[:DRIVER_WINDOW])
    green = _driver_green()

    never_checked = [
        n for n in ordered if n in oracles and n not in green and n not in window
    ]
    assert not never_checked, (
        f"hash-oracled queries with no driver CORRECTNESS row sit OUTSIDE the "
        f"first-{DRIVER_WINDOW} window and would go unverified again: "
        f"{never_checked} — front-load them in _DRIVER_WINDOW_PRIORITY"
    )


def test_window_has_no_unknown_names():
    """Window entries must resolve to registered queries — a typo here
    silently shrinks the verified set."""
    import __spark_entry__ as e

    missing = [n for n in e._DRIVER_WINDOW_PRIORITY if n not in e.queries()]
    assert not missing, missing


def test_window_list_is_exactly_the_driver_window():
    """ADVICE r13 #1: the old in-comment 'budget line' marker drifted off by
    one. The window is now a dedicated list; this pins the structural
    invariants so rotations edited against it cannot miscount again."""
    import __spark_entry__ as e

    assert len(e._DRIVER_WINDOW_50) == DRIVER_WINDOW
    assert len(set(e._DRIVER_WINDOW_50)) == DRIVER_WINDOW, "duplicates in window"
    assert not set(e._DRIVER_WINDOW_50) & set(e._DRIVER_WINDOW_TAIL), (
        "window entries duplicated in the tail"
    )
    assert list(e.queries())[:DRIVER_WINDOW] == e._DRIVER_WINDOW_50, (
        "queries() first-50 must be exactly _DRIVER_WINDOW_50"
    )
