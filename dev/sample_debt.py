#!/usr/bin/env python
"""Driver-sample debt report — the rotation-planning tool.

The round driver samples the first 50 entries of queries() order
(declared in queries.SAMPLE_PREFIX, reorder-enforced by load_all and
pinned by tests/test_plans.py::test_sample_prefix).  This script reads
every CORRECTNESS_r*.json and reports, per query family:

- queries that have NEVER produced a driver row (the debt),
- queries whose LAST driver row was red (must be re-proven — the
  reference re-proves after every fix, CometTestBase
  .checkSparkAnswerAndOperator),
- the current SAMPLE_PREFIX with each slot's status.

Run it when composing the next round's prefix:
    python dev/sample_debt.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from datafusion_comet_spark.queries import SAMPLE_PREFIX, load_all

    reg = load_all()
    module_of = {n: q.fn.__module__.rsplit(".", 1)[-1] for n, q in reg.items()}

    last_row: dict[str, tuple[int, bool]] = {}  # name -> (round, green)
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            # a rows-only check (oracle=None at the time) records
            # err='no_oracle' with spark_rows set — that is the weaker
            # PASS, not a red; a real red has a traceback in err or an
            # explicit False match flag
            green = (
                row.get("err") in (None, "no_oracle")
                and row.get("spark_rows") is not None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            last_row[name] = (rnd, green)

    never = defaultdict(list)
    reds = []
    for name in reg:
        if name not in last_row:
            never[module_of[name]].append(name)
        elif not last_row[name][1]:
            reds.append((name, last_row[name][0]))

    total_never = sum(len(v) for v in never.values())
    print(f"registry: {len(reg)} queries; never-sampled: {total_never}")
    for mod in sorted(never, key=lambda m: -len(never[m])):
        print(f"  {mod} ({len(never[mod])}): {', '.join(never[mod])}")
    print(f"stale reds (last driver row red): {len(reds)}")
    for name, rnd in reds:
        print(f"  {name} (red since r{rnd})")
    print(f"\ncurrent SAMPLE_PREFIX ({len(SAMPLE_PREFIX)} slots):")
    for i, name in enumerate(SAMPLE_PREFIX, 1):
        if name not in last_row:
            status = "NEVER SAMPLED -> first-ever row"
        else:
            rnd, green = last_row[name]
            status = f"last r{rnd} {'green' if green else 'RED'}"
        print(f"  {i:2d}. {name} [{status}]")

    # Suggested NEXT-round prefix: stale reds first (re-prove after
    # fix), then never-sampled queries — slow streaming capped at 2
    # per round (each stream_* runs a full availableNow execution),
    # then oldest-green rows to re-confirm.  Mechanical aid only; the
    # builder still reviews before editing queries.SAMPLE_PREFIX.
    sugg: list[str] = [n for n, _ in reds]
    flat_never = [n for mod in sorted(never, key=lambda m: -len(never[m])) for n in never[mod]]
    streams = 0
    for n in flat_never:
        if len(sugg) >= len(SAMPLE_PREFIX):
            break
        if reg[n].oracle is None:
            continue  # rows-only: never burn a prefix slot (test-enforced)
        if n.startswith("stream_"):
            if streams >= 2:
                continue
            streams += 1
        sugg.append(n)
    if len(sugg) < len(SAMPLE_PREFIX):
        by_age = sorted(
            (n for n in reg if n in last_row and n not in sugg),
            key=lambda n: last_row[n][0],
        )
        sugg.extend(by_age[: len(SAMPLE_PREFIX) - len(sugg)])
    print(f"\nsuggested next-round prefix ({len(sugg)} slots):")
    for i, name in enumerate(sugg, 1):
        print(f"  {i:2d}. \"{name}\",")


if __name__ == "__main__":
    main()
