#!/usr/bin/env python
"""Micro-benchmarks — scan / shuffle / aggregate / columnar-to-row / write.

Rebuild of the reference's micro-benchmark suite (reference:
spark/src/test/scala/org/apache/spark/sql/benchmark/{CometReadBenchmark,
CometShuffleBenchmark,CometColumnarToRowBenchmark}.scala and the
shuffle codec matrix in native/shuffle/src/shuffle_writer.rs): isolate
the primitive costs underneath every query — parquet scan (full vs
pruned+pushed), hash-partitioned shuffle, two-phase aggregation,
columnar→row materialization (Arrow collect), and parquet write per
codec — so a bench.py regression can be attributed to a primitive, not
guessed at.

Writes go through the `noop` sink (execution without sink cost) or a
temp dir (write benchmarks).  Prints ONE JSON line:
    {"metric": "microbench", "cases": {name: sec, ...}, "sf": N}

Run: python dev/microbench.py    [SPARK_GRAFT_SF_DIR=... to change scale]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERATIONS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERATIONS", "3"))


def timed(fn) -> float:
    best = None
    for _ in range(ITERATIONS):
        t0 = time.perf_counter()
        fn()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import functions as F

    from datafusion_comet_spark.session import get_session

    spark = get_session(app_name="dcs-microbench")
    li_path = os.path.join(sf_dir, "lineitem.parquet")
    li = spark.read.parquet(li_path)
    li.count()  # warm: JVM JIT + parquet footers in page cache

    cases: dict[str, float] = {}

    # -- scan: all columns materialized vs pruned projection with a
    #    pushed predicate (CometReadBenchmark's numeric-scan cases).
    cases["scan_full_width"] = timed(
        lambda: spark.read.parquet(li_path)
        .write.format("noop").mode("overwrite").save()
    )
    cases["scan_pruned_pushed"] = timed(
        lambda: spark.read.parquet(li_path)
        .filter(F.col("l_shipdate") > "1998-01-01")
        .select("l_orderkey", "l_extendedprice")
        .write.format("noop").mode("overwrite").save()
    )

    # -- shuffle: hash repartition of the full fact (CometShuffleBenchmark;
    #    partition count matches the session's shuffle parallelism).
    cases["shuffle_hash_32"] = timed(
        lambda: li.repartition(32, "l_orderkey")
        .write.format("noop").mode("overwrite").save()
    )
    # round-robin forces serialization of every row with no key
    cases["shuffle_roundrobin_32"] = timed(
        lambda: li.repartition(32)
        .write.format("noop").mode("overwrite").save()
    )

    # -- aggregate: two-phase partial/final hash aggregation
    cases["agg_twophase"] = timed(
        lambda: li.groupBy("l_partkey")
        .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
        .write.format("noop").mode("overwrite").save()
    )

    # -- columnar→row boundary: Arrow-batched driver materialization
    #    (CometColumnarToRowBenchmark; Arrow path per session config)
    cases["columnar_to_row_arrow"] = timed(
        lambda: li.select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"
        ).toPandas()
    )

    # -- write: parquet per codec (ParquetWriter codec matrix,
    #    reference operator.proto:301-306 zstd/lz4/snappy)
    out = tempfile.mkdtemp(prefix="dcs_microbench_")
    try:
        for codec in ("zstd", "lz4", "snappy"):
            dest = os.path.join(out, codec)
            cases[f"write_parquet_{codec}"] = timed(
                lambda d=dest, c=codec: li.write.option("compression", c)
                .mode("overwrite").parquet(d)
            )
    finally:
        shutil.rmtree(out, ignore_errors=True)

    print(json.dumps({"metric": "microbench", "cases": cases, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
