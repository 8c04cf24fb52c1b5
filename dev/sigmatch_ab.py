#!/usr/bin/env python
"""A/B for the round-11 LSH signature-match scale gate (sig_match_count).

Measures the two value-identical spellings of the 16-int signature
equal-position count at PAIR VOLUME (~2M synthesized pairs from the
sf0.1 corpus signatures, far past the gate's 100k-row key):

  fold     — F.zip_with + F.filter + F.size (interpreted HOF,
             CodegenFallback eval sites)
  unrolled — 16-term CASE-sum (whole-stage codegen)

Two phases, same process:
  fresh    — first thing the JVM executes (inline caches clean)
  polluted — after a pollution pass that executes a spread of OTHER
             HOF lambda shapes (the winnow/text/datapipe families),
             the long-lived-JVM regime where interpreted lambda eval
             sites degrade megamorphically (the round-11 mechanism
             pinned on the dot-product fold in dupskew_r11/embcos_ab*).

Each timing is min-of-N interleaved; both arms force every pair via a
global sum aggregate (collect of one row).  Prints ONE JSON line.

Run: python dev/sigmatch_ab.py   [SPARK_GRAFT_SF_DIR to change scale]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N = int(os.environ.get("AB_N", "4"))
LEFT_DOCS = 800  # x ~5000 docs / 2 => ~2M ordered pairs at sf0.1


def main() -> None:
    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.queries.datapipe import (
        _sig_match_fold,
        _sig_match_unrolled,
        minhash_signatures,
    )
    from datafusion_comet_spark.catalog import load_table
    from datafusion_comet_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="dcs-sigmatch-ab")
    sc = spark.sparkContext

    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"))
    # Materialize signatures once so the timed region is the per-pair
    # match count, not the shingling (tiny: |docs| rows of 16 ints).
    sigs = sigs.repartition(sc.defaultParallelism).persist()
    n_docs = sigs.count()

    def pairs_sum(match_col_fn):
        a = sigs.filter(F.col("doc_id") < LEFT_DOCS).select(
            F.col("doc_id").alias("a"), F.col("sig").alias("sa")
        )
        b = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sb"))
        return (
            a.crossJoin(b)
            .filter(F.col("a") < F.col("b"))
            .select(match_col_fn(F.col("sa"), F.col("sb")).alias("m"))
            .agg(F.sum("m").alias("total"), F.count(F.lit(1)).alias("pairs"))
        )

    # equivalence first: identical totals over the full pair set
    ra = pairs_sum(_sig_match_fold).collect()[0]
    rb = pairs_sum(_sig_match_unrolled).collect()[0]
    assert (ra["total"], ra["pairs"]) == (rb["total"], rb["pairs"]), (ra, rb)

    def timed_min(arm_fn, label):
        best = None
        for i in range(N):
            sc.setJobDescription(f"sigmatch:{label}:{i}")
            t0 = time.perf_counter()
            arm_fn().collect()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        return round(best, 3)

    out = {
        "metric": "sigmatch_ab",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "pairs": int(ra["pairs"]),
        "phases": {},
    }
    # phase 1: fresh JVM (interleaved)
    fresh = {"fold": [], "unrolled": []}
    for i in range(N):
        for label, fn in (("fold", _sig_match_fold), ("unrolled", _sig_match_unrolled)):
            sc.setJobDescription(f"sigmatch:fresh:{label}:{i}")
            t0 = time.perf_counter()
            pairs_sum(fn).collect()
            fresh[label].append(round(time.perf_counter() - t0, 3))
    out["phases"]["fresh"] = {k: min(v) for k, v in fresh.items()}
    out["phases"]["fresh_all"] = fresh

    # pollution pass: execute a spread of OTHER HOF lambda shapes
    reg = load_all()
    pollution = [
        "dedup_winnow_fingerprint",
        "text_stats",
        "dedup_ngram_jaccard",
        "doc_chunk_sliding",
        "quality_linear_scorer",
    ]
    ran = []
    for name in pollution:
        if name in reg:
            sc.setJobDescription(f"sigmatch:pollute:{name}")
            try:
                reg[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ran.append(name)
            except Exception:  # noqa: BLE001 - pollution is best-effort
                pass
    out["polluted_with"] = ran

    polluted = {"fold": [], "unrolled": []}
    for i in range(N):
        for label, fn in (("fold", _sig_match_fold), ("unrolled", _sig_match_unrolled)):
            sc.setJobDescription(f"sigmatch:polluted:{label}:{i}")
            t0 = time.perf_counter()
            pairs_sum(fn).collect()
            polluted[label].append(round(time.perf_counter() - t0, 3))
    out["phases"]["polluted"] = {k: min(v) for k, v in polluted.items()}
    out["phases"]["polluted_all"] = polluted

    print(json.dumps(out))


if __name__ == "__main__":
    main()
