#!/usr/bin/env python
"""Render the uniform-vs-skewed bench comparison as a markdown table
(round-9 verdict, "Next round #1" — the SCALE.md skew evidence).

Usage:
    python dev/skew_report.py dev/skew_r10/bench_sf1_uniform.json \
                              dev/skew_r10/bench_sf1_skew.json

Reads two bench.py JSON lines over the SAME query set (uniform and
Zipf-skewed generator data at the same sf) and prints per-query
wall-time, the skew/uniform ratio, and a flag column.  The skewed
lineitem carries ~+7% rows (bulk orders), so ratios up to ~1.15 are
volume, not skew; the flag marks >1.3x (worth a look) and >2x
(degradation — needs a plan fix or a documented mitigation).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    u = json.load(open(sys.argv[1]))
    s = json.load(open(sys.argv[2]))
    rows = []
    for name, ut in u["queries"].items():
        st = s["queries"].get(name)
        if st is None:
            continue
        r = st / ut
        flag = "**>2x**" if r > 2 else (">1.3x" if r > 1.3 else "")
        rows.append((name, ut, st, r, flag))
    rows.sort(key=lambda x: -x[3])
    print("| query | uniform s | skewed s | ratio | flag |")
    print("|---|---|---|---|---|")
    for name, ut, st, r, flag in rows:
        print(f"| {name} | {ut:.3f} | {st:.3f} | {r:.2f} | {flag} |")
    tu, ts = u["value"], s["value"]
    print(f"| **total** | {tu:.3f} | {ts:.3f} | {ts / tu:.2f} | |")


if __name__ == "__main__":
    main()
