#!/usr/bin/env python
"""Round-12 stage decomposition of tpcds_cross_channel_rollup at sf0.1.

Times cumulative pipeline prefixes with the noop sink (guide §1.4),
interleaved min-of-N in one process, so the marginal cost of each
stage is the difference between adjacent prefixes.
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
from datafusion_comet_spark.queries._shared import _dim_hint, _drev, _spread_scan
from datafusion_comet_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_BLOCKS", "6"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark, upto: str):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    part = load_table(spark, SF_DIR, "part").select("p_partkey", "p_brand")
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
    if upto == "common":
        return common
    threshold = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("sum_cents"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_all"),
    )
    if upto == "threshold":
        return threshold
    report_li = _spread_scan(li, SF_DIR, "lineitem")
    if upto == "spread":
        return report_li.select(
            "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
    semi = report_li.join(
        _dim_hint(common.withColumnRenamed("l_partkey", "cp"), SF_DIR, "part"),
        F.col("l_partkey") == F.col("cp"),
        "left_semi",
    )
    if upto == "semi":
        return semi.select(
            "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
    filt = semi.crossJoin(F.broadcast(threshold)).filter(
        F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
        * F.col("n_all")
        > F.col("sum_cents")
    )
    if upto == "filter":
        return filt.select(
            "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
        )
    joined = filt.join(
        _dim_hint(part, SF_DIR, "part"), F.col("l_partkey") == part.p_partkey
    ).withColumn("yr", F.year("l_shipdate").cast("int"))
    if upto == "partjoin":
        return joined.select("p_brand", "yr", "l_extendedprice", "l_discount")
    rolled = (
        joined.rollup("p_brand", "yr")
        .agg(
            (F.grouping("p_brand") + F.lit(2) * F.grouping("yr"))
            .cast("int")
            .alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(F.sum(_drev()), 2).cast("double").alias("revenue"),
        )
        .select("p_brand", "yr", "lvl", "n_lines", "revenue")
    )
    if upto == "rollup":
        return rolled
    return rolled.orderBy(
        "lvl", F.col("p_brand").asc_nulls_first(), F.col("yr").asc_nulls_first()
    )


STAGES = [
    "common", "threshold", "spread", "semi", "filter",
    "partjoin", "rollup", "full",
]


def main() -> None:
    spark = get_session(app_name="cc-decompose")
    for s in STAGES:  # warmup each shape once
        noop(build(spark, s))
    mins = {s: None for s in STAGES}
    for _ in range(ROUNDS):
        for s in STAGES:
            t0 = time.perf_counter()
            noop(build(spark, s))
            el = time.perf_counter() - t0
            if mins[s] is None or el < mins[s]:
                mins[s] = el
    out = {s: round(v, 3) for s, v in mins.items()}
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "dev", "cc_decompose_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
