#!/usr/bin/env python
"""Per-query bench regression gate (VERDICT r6 #7).

Compares the two newest BENCH_r{N}.json files (or two paths given on the
command line) and flags every headline query whose SAME-RUN Spark/DuckDB
steady ratio moved by more than RATIO_DRIFT_X between rounds. The same-run
ratio is the load-normalized signal: raw seconds drift with host load
(r4/r5 root cause — byte-identical plans, scheduling constants), but both
engines measured in the same process see the same load, so a >1.5× ratio
move means the PLAN changed, not the host. Queries without a DuckDB pair
(q_ner*) fall back to raw-seconds drift with a wider gate and a LOAD tag
so a busy-host round doesn't read as a plan regression.

Usage:
    python tools/bench_regression.py                  # two newest BENCH_r*.json
    python tools/bench_regression.py OLD.json NEW.json

Exit status 1 iff any RATIO-drift row fires (LOAD rows are informational).
Also usable as a library: `compare(old_parsed, new_parsed) -> list[dict]`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

RATIO_DRIFT_X = 1.5  # same-run ratio move that demands adjudication
RAW_DRIFT_X = 3.0  # unpaired fallback: raw seconds move (host-load noisy)
MIN_SEC = 0.02  # ignore sub-20ms cells: pure scheduling jitter
# Floor-aware band (VERDICT r7 What's-wrong #1): when the Spark cell is
# under FLOOR_SEC in both rounds, its time is dominated by the per-query
# job floor (plan build + stage scheduling, ~0.08-0.2 s) whose jitter is
# comparable to the measurement itself, so the DuckDB-side denominator
# (5-30 ms) turns pure host noise into >1.5x ratio moves. Two fresh
# same-run pairs at r8 HEAD measured q_text_stats spanning 2.9-4.4x and
# q_fingerprint 0.72-1.12x with byte-identical plans — widen the gate for
# those cells instead of demanding adjudication of scheduling jitter.
FLOOR_SEC = 0.20
FLOOR_RATIO_DRIFT_X = 2.5


def _parsed(path: str) -> dict:
    doc = json.load(open(path))
    return doc["parsed"] if "parsed" in doc else doc


def _ratio(parsed: dict, q: str) -> float | None:
    s = (parsed.get("queries") or {}).get(q)
    d = (parsed.get("duckdb_queries") or {}).get(q)
    if s is None or d is None or d <= 0 or max(s, d) < MIN_SEC:
        return None
    return s / d


def compare(old: dict, new: dict) -> list[dict]:
    flags = []
    qs = sorted(set(old.get("queries", {})) & set(new.get("queries", {})))
    for q in qs:
        r_old, r_new = _ratio(old, q), _ratio(new, q)
        if r_old is not None and r_new is not None:
            move = max(r_new / r_old, r_old / r_new)
            floor = (
                max(old["queries"][q], new["queries"][q]) < FLOOR_SEC
            )
            gate = FLOOR_RATIO_DRIFT_X if floor else RATIO_DRIFT_X
            if move > gate:
                flags.append(
                    {
                        "query": q,
                        "kind": "RATIO",
                        "old": round(r_old, 2),
                        "new": round(r_new, 2),
                        "move_x": round(move, 2),
                    }
                )
            continue
        s_old, s_new = old["queries"][q], new["queries"][q]
        if min(s_old, s_new) < MIN_SEC:
            continue
        move = max(s_new / s_old, s_old / s_new)
        if move > RAW_DRIFT_X:
            flags.append(
                {
                    "query": q,
                    "kind": "LOAD?",  # no same-run pair: could be host load
                    "old": s_old,
                    "new": s_new,
                    "move_x": round(move, 2),
                }
            )
    return flags


def main(argv: list[str]) -> int:
    if len(argv) == 3:
        old_path, new_path = argv[1], argv[2]
    else:
        # sort by the PARSED round number, not lexically — lexical order
        # breaks once rounds exceed the zero-padded width (r100 < r99)
        # or padding is inconsistent (ADVICE r7 #2)
        def _round_no(p: str) -> int:
            m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p))
            return int(m.group(1)) if m else -1

        paths = sorted(
            glob.glob(
                os.path.join(os.path.dirname(__file__), "..", "BENCH_r*.json")
            ),
            key=_round_no,
        )
        if len(paths) < 2:
            print("need two BENCH_r*.json files")
            return 0
        old_path, new_path = paths[-2], paths[-1]
    old, new = _parsed(old_path), _parsed(new_path)
    flags = compare(old, new)
    print(f"bench regression gate: {os.path.basename(old_path)} -> {os.path.basename(new_path)}")
    hard = [f for f in flags if f["kind"] == "RATIO"]
    for f in flags:
        print(
            f"  {f['kind']:6} {f['query']:20} {f['old']} -> {f['new']} "
            f"({f['move_x']}x)"
        )
    if not flags:
        print("  clean: no per-query drift beyond gates")
    print(
        f"== {len(hard)} ratio-drift, {len(flags) - len(hard)} load-suspect "
        f"/ {len(set(old.get('queries', {})) & set(new.get('queries', {})))} paired =="
    )
    return 1 if hard else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
