#!/usr/bin/env python
"""A/B: tpcds_cross_channel_rollup HEAD spelling (3 lineitem passes:
key-set + threshold + report) vs the round-12 fused spelling (per-part
aggregate persisted, feeding both the key set and the threshold — 2
passes).  Interleaved same-process min-of-N; rows compared exactly
equal first.  Warm series matches bench semantics (no cache clear
between runs — the persist is reused, as bench min-of-4 would);
cold series clears the cache before every run.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from datafusion_comet_spark.catalog import load_table
from datafusion_comet_spark.queries import load_all
from datafusion_comet_spark.queries._shared import (
    _dim_hint,
    _drev,
    _spread_scan,
)
from datafusion_comet_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BLOCKS = int(os.environ.get("AB_BLOCKS", "6"))


def old_fn(spark, sf_dir):
    """HEAD spelling (pre-fusion), verbatim."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    common = (
        li.select("l_orderkey", "l_partkey")
        .join(
            orders.filter(F.col("o_orderstatus").isin("O", "F")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_partkey")
        .agg(
            (
                F.max((F.col("o_orderstatus") == "O").cast("int"))
                + F.max((F.col("o_orderstatus") == "F").cast("int"))
            ).alias("nch")
        )
        .filter(F.col("nch") == 2)
        .select("l_partkey")
    )
    threshold = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("sum_cents"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_all"),
    )
    report_li = _spread_scan(li, SF_DIR, "lineitem")
    filtered = (
        report_li.join(
            _dim_hint(
                common.withColumnRenamed("l_partkey", "cp"), sf_dir, "part"
            ),
            F.col("l_partkey") == F.col("cp"),
            "left_semi",
        )
        .crossJoin(F.broadcast(threshold))
        .filter(
            F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
            * F.col("n_all")
            > F.col("sum_cents")
        )
        .join(
            _dim_hint(part, sf_dir, "part"),
            F.col("l_partkey") == part.p_partkey,
        )
        .withColumn("yr", F.year("l_shipdate").cast("int"))
    )
    return (
        filtered.rollup("p_brand", "yr")
        .agg(
            (F.grouping("p_brand") + F.lit(2) * F.grouping("yr"))
            .cast("int")
            .alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum(_drev()), 2).cast("double").alias("revenue"),
        )
        .select("p_brand", "yr", "lvl", "n_lines", "revenue")
        .orderBy(
            "lvl",
            F.col("p_brand").asc_nulls_first(),
            F.col("yr").asc_nulls_first(),
        )
    )


def main() -> None:
    registry = load_all()
    new_fn = registry["tpcds_cross_channel_rollup"].fn
    spark = get_session(app_name="cc-fuse-ab")

    rows_old = old_fn(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    rows_new = new_fn(spark, SF_DIR).collect()
    keyf = lambda r: [(x is None, str(x)) for x in r]
    eq = sorted(map(tuple, rows_old), key=keyf) == sorted(
        map(tuple, rows_new), key=keyf
    )
    print(f"rows_equal={eq} n={len(rows_old)}", flush=True)
    if not eq:
        sys.exit("ROWS DIFFER — abort")

    out = {"rows_equal": eq, "n_rows": len(rows_old)}
    # warm series: bench semantics (no clearCache between runs)
    for label, clear in (("warm", False), ("cold", True)):
        spark.catalog.clearCache()
        mins = {"old": None, "new": None}
        for _ in range(BLOCKS):
            for arm, fn in (("old", old_fn), ("new", new_fn)):
                if clear:
                    spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                el = time.perf_counter() - t0
                if mins[arm] is None or el < mins[arm]:
                    mins[arm] = el
        out[label] = {k: round(v, 3) for k, v in mins.items()}
        out[label]["new_over_old"] = round(mins["new"] / mins["old"], 3)
        print(json.dumps({label: out[label]}), flush=True)
    with open(os.path.join(REPO, "dev", "cc_fuse_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
