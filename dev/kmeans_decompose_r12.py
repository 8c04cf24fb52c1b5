#!/usr/bin/env python
"""Round-12 stage decomposition of ann_ivf_kmeans' PROBE at sf0.1.

Cumulative noop-sink prefixes, interleaved min-of-N in one process —
the Lloyd build is memoized (bench steady-state), so the timings are
probe-path costs: scan+norm+assign, +broadcast join, +window top-k.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datafusion_comet_spark.catalog import parquet_num_rows
from datafusion_comet_spark.queries.similarity import (
    COARSE_TRAIN_MAX_ROWS,
    _as_double,
    _emb,
    _lloyd_centroids,
    _nearest,
    pair_dot,
    row_norm,
)
from datafusion_comet_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_BLOCKS", "6"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def build(spark, upto: str):
    emb = _emb(spark, SF_DIR).select(
        "vec_id", _as_double("embedding").alias("emb")
    )
    if upto == "scan":
        return emb
    cents = _lloyd_centroids(
        emb, "vec_id", "emb", k=8, iters=10, seed=42,
        cache_key=f"{SF_DIR}|coarse-8-10-42-ff", init="farthest",
        train_max_rows=COARSE_TRAIN_MAX_ROWS,
        train_total_rows=parquet_num_rows(SF_DIR, "embeddings"),
    )
    assigned = emb.select(
        "vec_id",
        "emb",
        row_norm(SF_DIR)(F.col("emb")).alias("nrm"),
        _nearest(F.col("emb"), cents).alias("cell"),
    )
    if upto == "assign":
        return assigned.select("vec_id", "nrm", "cell")
    queries = assigned.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "cell",
    )
    scored = (
        assigned.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                pair_dot(SF_DIR)(F.col("q_emb"), F.col("emb"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("sim_raw"),
        )
    )
    if upto == "join":
        return scored
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
    out = (
        scored.select(
            "qid", "vec_id", F.round("sim_raw", 6).alias("sim"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )
    if upto == "window":
        return out
    return out.orderBy("qid", "rn")


STAGES = ["scan", "assign", "join", "window", "full"]


def main() -> None:
    spark = get_session(app_name="kmeans-decompose")
    for s in STAGES:
        noop(build(spark, s))  # warmup (also pays the Lloyd build once)
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
    with open(os.path.join(REPO, "dev", "kmeans_decompose_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
