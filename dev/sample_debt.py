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
- queries whose last driver row was the weaker rows-only `no_oracle`
  status but which NOW carry an oracle (round-7 verdict, What's wrong
  #1: these are debt too — the hash-checkable proof has never run),
- the current SAMPLE_PREFIX with each slot's status,
- a depth-2 rotation plan (next round AND the round after), so the
  completion path to "every registry query has a green driver row" is
  mechanical.

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

# Each slow-streaming query executes a full availableNow run (~1.5-20s
# of driver sample budget); cap how many one suggested prefix carries.
MAX_STREAMING_PER_ROUND = 8


def scan_rows(rows_by_round) -> dict:
    """Fold CORRECTNESS rows into name -> (last_round, green, hash_proven).

    A rows-only check (oracle=None at the time) records err='no_oracle'
    with spark_rows set — that is the weaker PASS, not a red; a real
    red has a traceback in err or an explicit False match flag.  A
    query stays hash_proven once ANY row hash-matched, even if a later
    row is weaker."""
    last_row: dict[str, tuple[int, bool, bool]] = {}
    for rnd, rows in sorted(rows_by_round.items()):
        for name, row in rows.items():
            green = (
                row.get("err") in (None, "no_oracle")
                and row.get("spark_rows") is not None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            hash_proven = green and row.get("err") is None and row.get("hash_match") is True
            prev = last_row.get(name)
            last_row[name] = (
                rnd,
                green,
                hash_proven or (prev[2] if prev and rnd >= prev[0] else False),
            )
    return last_row


def classify(reg, last_row, module_of) -> tuple:
    """Split the registry into (never_by_module, reds, stale_no_oracle).

    stale_no_oracle is the round-7 verdict's What's-wrong #1 class:
    the query's driver history has no hash-match but it NOW carries an
    oracle — the hash-checkable proof has never run, so it is debt."""
    never = defaultdict(list)
    reds = []
    stale_no_oracle = []
    for name in reg:
        if name not in last_row:
            never[module_of[name]].append(name)
            continue
        rnd, green, hash_proven = last_row[name]
        if not green:
            reds.append((name, rnd))
        elif not hash_proven and reg[name].oracle is not None:
            stale_no_oracle.append((name, rnd))
    return never, reds, stale_no_oracle


def main() -> None:
    from datafusion_comet_spark.queries import SAMPLE_PREFIX, load_all

    reg = load_all()
    module_of = {n: q.fn.__module__.rsplit(".", 1)[-1] for n, q in reg.items()}

    rows_by_round = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        rows_by_round[rnd] = json.load(open(path))
    last_row = scan_rows(rows_by_round)
    never, reds, stale_no_oracle = classify(reg, last_row, module_of)

    total_never = sum(len(v) for v in never.values())
    print(f"registry: {len(reg)} queries; never-sampled: {total_never}")
    for mod in sorted(never, key=lambda m: -len(never[m])):
        print(f"  {mod} ({len(never[mod])}): {', '.join(never[mod])}")
    print(f"stale reds (last driver row red): {len(reds)}")
    for name, rnd in reds:
        print(f"  {name} (red since r{rnd})")
    print(
        f"stale no_oracle rows with an oracle now (hash-proof never run): {len(stale_no_oracle)}"
    )
    for name, rnd in stale_no_oracle:
        print(f"  {name} (rows-only row from r{rnd}; oracle exists — re-prove)")
    print(f"\ncurrent SAMPLE_PREFIX ({len(SAMPLE_PREFIX)} slots):")
    for i, name in enumerate(SAMPLE_PREFIX, 1):
        if name not in last_row:
            status = "NEVER SAMPLED -> first-ever row"
        else:
            rnd, green, hash_proven = last_row[name]
            grade = "green" if green else "RED"
            if green and not hash_proven:
                grade += " (rows-only)"
            status = f"last r{rnd} {grade}"
        print(f"  {i:2d}. {name} [{status}]")

    # Debt-first rotation plan, depth 2.  Priority: stale reds, then
    # stale no_oracle re-proofs, then never-sampled hash-checkable
    # queries (streaming capped per round), then never-sampled
    # rows-only queries (weaker gate, but "every registry query has a
    # green driver row" is the stated bar — they go LAST and need the
    # test_sample_prefix allowance widened when scheduled).  NEVER pad
    # with already-green rows while any debt remains (round-7 verdict);
    # if all debt fits with room to spare, remaining slots re-confirm
    # the OLDEST green rows.
    debt: list[str] = [n for n, _ in reds]
    debt += [n for n, _ in stale_no_oracle if n not in debt]
    flat_never = [
        n
        for mod in sorted(never, key=lambda m: -len(never[m]))
        for n in never[mod]
    ]
    debt += [n for n in flat_never if reg[n].oracle is not None and not n.startswith("stream_")]
    debt += [n for n in flat_never if reg[n].oracle is not None and n.startswith("stream_")]
    rows_only_debt = [n for n in flat_never if reg[n].oracle is None]

    plans: list[list[str]] = []
    remaining = list(debt)
    remaining_rows_only = list(rows_only_debt)
    for _ in range(2):
        plan: list[str] = []
        streams = 0
        deferred: list[str] = []
        for n in remaining:
            if len(plan) >= len(SAMPLE_PREFIX):
                deferred.append(n)
                continue
            if n.startswith("stream_") and streams >= MAX_STREAMING_PER_ROUND:
                deferred.append(n)
                continue
            if n.startswith("stream_"):
                streams += 1
            plan.append(n)
        remaining = deferred
        # rows-only debt fills spare slots only once hash debt is gone
        while remaining_rows_only and len(plan) < len(SAMPLE_PREFIX) and not remaining:
            plan.append(remaining_rows_only.pop(0))
        if len(plan) < len(SAMPLE_PREFIX) and not remaining and not remaining_rows_only:
            by_age = sorted(
                (n for n in reg if n in last_row and n not in plan),
                key=lambda n: last_row[n][0],
            )
            plan.extend(by_age[: len(SAMPLE_PREFIX) - len(plan)])
        plans.append(plan)

    for depth, plan in enumerate(plans, 1):
        print(f"\nsuggested prefix, {depth} round(s) out ({len(plan)} slots):")
        for i, name in enumerate(plan, 1):
            note = " [rows-only — widen test_sample_prefix allowance]" if reg[name].oracle is None else ""
            print(f"  {i:2d}. \"{name}\",{note}")
    if remaining or remaining_rows_only:
        print(f"\nstill unscheduled after 2 rounds: {remaining + remaining_rows_only}")


if __name__ == "__main__":
    main()
