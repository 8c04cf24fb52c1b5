#!/usr/bin/env python
"""A/B: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning.

Default false keeps a persisted plan's shuffle output UNCOALESCED (AQE
partition coalescing is disabled inside cached plans so their output
partitioning stays stable).  For the bench queries built around a
persist() of a tiny aggregate (tpcds_return_ratio_rank's cand,
text_bm25_multiquery's tf) that pins every downstream stage to
spark.sql.shuffle.partitions tasks of near-empty work.

Interleaved same-process min-of-N per arm; rows collected and compared
for exact equality before any timing is trusted.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from datafusion_comet_spark.queries import load_all
from datafusion_comet_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = sys.argv[1:] or ["tpcds_return_ratio_rank", "text_bm25_multiquery"]
CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
BLOCKS = 3          # interleaved blocks per arm
WARM_PER_BLOCK = 3  # timed warm runs inside each block


def run_arm(spark, fn, value: str):
    spark.conf.set(CONF, value)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    rows = fn(spark, SF_DIR).collect()
    cold = time.perf_counter() - t0
    best = None
    for _ in range(WARM_PER_BLOCK):
        t0 = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return cold, best, rows


def main() -> None:
    registry = load_all()
    spark = get_session(app_name="cached-coalesce-ab")
    out = {}
    for name in QUERIES:
        fn = registry[name].fn
        fn(spark, SF_DIR).collect()  # JVM/codegen warmup, arm-neutral
        res = {"false": {"cold": [], "warm": []},
               "true": {"cold": [], "warm": []}}
        rows_by_arm = {}
        for _ in range(BLOCKS):
            for arm in ("false", "true"):
                cold, warm, rows = run_arm(spark, fn, arm)
                res[arm]["cold"].append(round(cold, 3))
                res[arm]["warm"].append(round(warm, 3))
                rows_by_arm[arm] = rows
        eq = sorted(map(tuple, rows_by_arm["false"])) == sorted(
            map(tuple, rows_by_arm["true"])
        )
        out[name] = {
            "rows_equal": eq,
            "n_rows": len(rows_by_arm["true"]),
            "false_cold_min": min(res["false"]["cold"]),
            "true_cold_min": min(res["true"]["cold"]),
            "false_warm_min": min(res["false"]["warm"]),
            "true_warm_min": min(res["true"]["warm"]),
            "detail": res,
        }
        print(json.dumps({name: out[name]}, indent=1))
    spark.catalog.clearCache()
    spark.stop()
    with open(os.path.join(REPO, "dev", "cached_coalesce_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
