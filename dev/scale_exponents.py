#!/usr/bin/env python
"""Compute per-query scaling exponents from a series of bench JSONs
(round-8 verdict, "Next round #5").

Exponent model: t(sf) ~ c * sf^e, fit by least squares on
log(t) vs log(sf) across every provided point.  e <= ~1 is
near-linear-or-better (what a scan-bound or shuffle-bound query should
show); e >> 1 flags a super-linear path (all-pairs joins, single-reducer
sorts) that would not survive 100 TB.  Sub-linear exponents (e ~ 0) mean
fixed overhead (driver/planning/JVM) still dominates at these sizes —
the honest reading is "flat so far", not "O(1) at scale".

Usage: python dev/scale_exponents.py bench_sf0.1.json bench_sf0.3.json ...
Each input is one bench.py output line; sf is read from the JSON.
Prints a markdown table sorted by exponent, descending.
"""

from __future__ import annotations

import json
import math
import sys


def fit_exponent(points: list[tuple[float, float]]) -> float:
    xs = [math.log(sf) for sf, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            runs.append(json.load(f))
    runs.sort(key=lambda r: r["sf"])
    if len(runs) < 2:
        sys.exit("need >= 2 bench JSONs")
    sfs = [r["sf"] for r in runs]
    names = [n for n in runs[0]["queries"] if all(n in r["queries"] for r in runs)]
    rows = []
    for n in names:
        pts = [(r["sf"], r["queries"][n]) for r in runs]
        rows.append((n, [t for _, t in pts], fit_exponent(pts)))
    rows.sort(key=lambda r: -r[2])
    hdr = " | ".join(f"sf{sf:g}" for sf in sfs)
    print(f"| query | {hdr} | exponent |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for n, ts, e in rows:
        cells = " | ".join(f"{t:.3f}" for t in ts)
        print(f"| {n} | {cells} | {e:+.2f} |")
    tot = [(r["sf"], r["value"]) for r in runs]
    print(f"| **total** | "
          + " | ".join(f"{v:.3f}" for _, v in tot)
          + f" | {fit_exponent(tot):+.2f} |")


if __name__ == "__main__":
    main()
