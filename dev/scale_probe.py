#!/usr/bin/env python
"""Scale probe — how the PLANS change as the data grows 100x.

The 100 TB claim rests on plans adapting with scale: dimension joins
staying broadcast while anything data-sized migrates broadcast →
shuffle as it outgrows the threshold, without any query change.  This
probe builds each headline query at sf0.001 / sf0.01 / sf0.1 (two
decades of growth) and tabulates the statically-planned join
strategies and exchange counts, so the transition is a recorded fact
rather than an assertion.  (Static plans: Spark's size-statistics
drive the broadcast decision at planning time; AQE can only further
demote at runtime.)

Run: python dev/scale_probe.py   (prints a markdown table; the
current output is committed at the bottom of SCALE.md)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "q18_large_volume",
    "q21_waiting_supplier",
    "tpcds_repeat_purchase_chain",
    "dedup_minhash_lsh",
    "corpus_snapshot_diff",
    "ann_bruteforce_topk",
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def probe(plan: str) -> str:
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    shj = plan.count("ShuffledHashJoin")
    bnl = plan.count("BroadcastNestedLoopJoin")
    exch = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    parts = []
    if bhj:
        parts.append(f"{bhj}×BHJ")
    if smj:
        parts.append(f"{smj}×SMJ")
    if shj:
        parts.append(f"{shj}×SHJ")
    if bnl:
        parts.append(f"{bnl}×BNLJ")
    parts.append(f"{exch}ex")
    return " ".join(parts)


def main() -> None:
    from datafusion_comet_spark.plans.introspect import plan_string
    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.session import get_session

    spark = get_session(app_name="dcs-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    rows = []
    for name in QUERIES:
        cells = []
        for sf in SFS:
            df = registry[name].fn(spark, f"/root/testdata/{sf}")
            cells.append(probe(plan_string(df, "simple")))
        rows.append((name, cells))
    print("| query | " + " | ".join(SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for name, cells in rows:
        print(f"| {name} | " + " | ".join(cells) + " |")

    # Second pass: shrink the broadcast threshold 512x (32MB -> 64KB),
    # the statistics-equivalent of growing every table ~512x beyond
    # sf0.1 — i.e. past SF50 dimension sizes.  Explicit F.broadcast
    # hints survive (STRUCTURAL broadcasts: the dims a 100 TB plan
    # still wants resident); statistics-driven broadcasts demote to
    # shuffle joins (the fact-side joins that must).
    print()
    print("With autoBroadcastJoinThreshold=64KB (simulating ~512x growth"
          " past sf0.1):")
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "65536")
        print("| query | joins at simulated scale |")
        print("|---|---|")
        for name in QUERIES:
            df = registry[name].fn(spark, "/root/testdata/sf0.1")
            print(f"| {name} | {probe(plan_string(df, 'simple'))} |")
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    spark.stop()


if __name__ == "__main__":
    main()
