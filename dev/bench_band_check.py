#!/usr/bin/env python
"""Per-query bench regression bands against the pinned quiet minima.

Round-10's verdict showed why the single-shot driver BENCH artifact
cannot be the regression baseline: co-tenant load inflated every query
~1.4x uniformly with zero code changes, which leaves enough room for a
real single-query regression to hide inside a loaded run.  The real
baseline is the per-query QUIET minimum (dev/bench_baseline_sf0.1.json,
pinned from dev/scale_series_r10b/min_sf0.1.json — round 10's min-of-4
series on an idle box).

Usage:
    python bench.py > /tmp/quiet1.json        # one or more quiet passes
    python bench.py > /tmp/quiet2.json
    python dev/bench_band_check.py /tmp/quiet1.json /tmp/quiet2.json

Takes the per-query MIN across the given bench JSON files (min-of-runs
is the same spike-rejection the bench itself applies across
iterations), compares each against the baseline, and fails (exit 1) on
any query above BAND (1.3x) its recorded minimum.  Queries absent from
the baseline (new this round) are reported as candidates to ratchet in;
queries that beat their baseline by >10% are reported as ratchet-downs.
A band violation is NOT automatically a code regression — adjudicate
with one more quiet pass (two independent runs both >1.3x = real); the
point is that it can no longer pass silently.

Baseline update policy: ratchet values DOWN freely (a smaller quiet
minimum is strictly better information); raise a value only with a
written justification in the round's SCALE.md section (e.g. q17's
accepted +0.08s skew-safety trade, round 10).
"""

from __future__ import annotations

import json
import os
import sys

BAND = 1.3
BASELINE = os.path.join(os.path.dirname(__file__), "bench_baseline_sf0.1.json")


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        # bench.py prints one JSON line; tolerate stderr '#' noise lines
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)["queries"]
    raise SystemExit(f"no JSON line found in {path}")


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    with open(BASELINE) as f:
        base = json.load(f)["queries"]
    runs = [load_queries(p) for p in argv]
    merged: dict[str, float] = {}
    for run in runs:
        for name, sec in run.items():
            merged[name] = min(merged.get(name, sec), sec)

    violations, ratchets, new = [], [], []
    for name, sec in sorted(merged.items()):
        if name not in base:
            new.append((name, sec))
            continue
        ratio = sec / base[name]
        flag = ""
        if ratio > BAND:
            violations.append((name, sec, base[name], ratio))
            flag = "  <-- ABOVE BAND"
        elif ratio < 0.9:
            ratchets.append((name, sec))
        print(f"{name:35s} {sec:7.3f}s  base {base[name]:7.3f}s  "
              f"{ratio:5.2f}x{flag}")
    for name, sec in new:
        print(f"{name:35s} {sec:7.3f}s  (no baseline — new; ratchet in)")

    missing = sorted(set(base) - set(merged))
    if missing:
        print(f"# baseline queries absent from this run: {missing}")
    if ratchets:
        print(f"# ratchet-down candidates (>10% better): "
              f"{[n for n, _ in ratchets]}")
    if violations:
        print(f"\n{len(violations)} quer{'y' if len(violations)==1 else 'ies'} "
              f"above the {BAND}x quiet band:")
        for name, sec, b, r in violations:
            print(f"  {name}: {sec:.3f}s vs quiet-min {b:.3f}s ({r:.2f}x)")
        print("Adjudicate with another quiet pass before calling it a "
              "code regression — but do not ship without adjudicating.")
        return 1
    print("\nall queries inside the quiet band")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
