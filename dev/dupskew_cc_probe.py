#!/usr/bin/env python
"""Diagnose the uniform-corpus dedup_lsh_star_cluster reading (round 11).

The dup-skew series measured 92.6 s (uniform sf1) vs 11.8 s (dup-skew
sf1) for dedup_lsh_star_cluster — inverted from every other family
member.  Hypothesis: the star EDGE construction is linear in both
corpora, but the naive min-label `connected_components` downstream is
O(diameter) fixpoint rounds; the uniform corpus's candidate graph has
long near-dup CHAINS (small synthetic vocabulary -> transitive hub
links) while dup-skew clusters are diameter-2 stars that converge in
~2 rounds.

Measures, per corpus dir:
  - edge count and component stats of the star candidate graph
  - fixpoint rounds + wall time for naive propagation
  - fixpoint rounds + wall time for pointer doubling
Prints one JSON line per corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def star_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from datafusion_comet_spark.queries.datapipe import (
        N_HASHES,
        lsh_band_buckets,
        minhash_signatures,
    )
    from datafusion_comet_spark.queries._shared import _t

    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    bands = lsh_band_buckets(sigs).repartition("band", "bucket")
    hubs = bands.groupBy("band", "bucket").agg(
        F.min("doc_id").alias("hub"),
        F.min_by("sig", "doc_id").alias("sig_hub"),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig", "sig_hub", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(float(N_HASHES))
    )
    return (
        bands.join(hubs, ["band", "bucket"])
        .filter(F.col("doc_id") != F.col("hub"))
        .filter(F.round(est, 4) >= 0.5)
        .select(F.col("hub").alias("a"), F.col("doc_id").alias("b"))
        .distinct()
    )


def timed_cc(fn, edges):
    t0 = time.perf_counter()
    out = fn(edges)
    n_comp = out.count()
    return round(time.perf_counter() - t0, 3), n_comp


def main() -> None:
    from pyspark.sql import functions as F

    from datafusion_comet_spark.queries import datapipe
    from datafusion_comet_spark.session import get_session

    spark = get_session(app_name="dcs-dupskew-cc-probe")
    for sf_dir in sys.argv[1:]:
        sf_dir = sf_dir.rstrip("/")
        edges = star_edges(spark, sf_dir).persist()
        n_edges = edges.count()
        # component-size / diameter proxy from the doubling result
        comps = datapipe.connected_components_doubling(edges)
        sizes = (
            comps.groupBy("comp")
            .count()
            .agg(
                F.count("*").alias("n_comps"),
                F.max("count").alias("max_size"),
                F.avg("count").alias("avg_size"),
            )
            .collect()[0]
        )
        naive_s, naive_c = timed_cc(datapipe.connected_components, edges)
        doubling_s, doubling_c = timed_cc(
            datapipe.connected_components_doubling, edges
        )
        assert naive_c == doubling_c, (naive_c, doubling_c)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_edges": n_edges,
                    "n_comps": sizes["n_comps"],
                    "max_comp_size": sizes["max_size"],
                    "avg_comp_size": round(sizes["avg_size"], 2),
                    "naive_sec": naive_s,
                    "doubling_sec": doubling_s,
                }
            ),
            flush=True,
        )
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
