#!/usr/bin/env python
"""Tuning-delta report — quantify what the engine's defaults buy.

The reference's single biggest benchmark win is a CONFIG change:
replacing sort-merge joins with hash joins took TPC-H SF1000 from
637.6s to 521.7s (reference: benchmarks/results/0.16.0/
comet-tpch-hashjoin.json; docs/source/contributor-guide/
benchmark-results/tpc-h.md:72-75).  This engine bakes the equivalent
policy into its session defaults (session.py: generous broadcast
thresholds + AQE).  This report measures the same deltas on our
bench subset so the defaults are a documented, re-measurable choice,
not folklore:

  default   — the engine session as shipped
  smj       — broadcast disabled, sort-merge preferred (the
              un-tuned baseline posture)
  no_aqe    — adaptive execution off (static plans)

Prints ONE JSON line: {"metric": "tuning_report", "variants":
{name: {query: sec}}, "sf": N}.  All variants run in one JVM; every
knob used is runtime-settable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "q18_large_volume",
    "q21_waiting_supplier",
]

VARIANTS: dict[str, dict[str, str]] = {
    "default": {},
    "smj": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    },
    "no_aqe": {
        "spark.sql.adaptive.enabled": "false",
    },
}

ITERATIONS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERATIONS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="dcs-tuning-report")
    registry[QUERIES[0]].fn(spark, sf_dir).collect()  # warm JVM

    out: dict[str, dict[str, float]] = {}
    for variant, conf in VARIANTS.items():
        saved = {}
        for k, v in conf.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        per: dict[str, float] = {}
        for name in QUERIES:
            best = None
            for _ in range(ITERATIONS):
                t0 = time.perf_counter()
                registry[name].fn(spark, sf_dir).collect()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            per[name] = round(best, 3)
        per["total"] = round(sum(per.values()), 3)
        out[variant] = per
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        print(f"# {variant}: {per['total']:.3f}s", file=sys.stderr)

    print(json.dumps({"metric": "tuning_report", "variants": out, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
