#!/usr/bin/env python
"""A/B for the round-11 dedup_embedding_cosine probe-side rebalance.

Arm A (pre-fix spelling, inlined): pair join directly over the
2-file embeddings scan — the broadcast join inherits 2 map
partitions, so the ~1.4M-pair interpreted zip_with/aggregate stream
runs on 2 tasks (jstack: one task, 17+ min CPU inside ZipWith.eval).
Arm B (registry, post-fix): probe side round-robin repartitioned to
spark.sql.shuffle.partitions before the join.

B runs min-of-5; A is capped at 2 runs — the contrast is orders of
magnitude, not noise, and A's pathology is separately evidenced by
the jstack trace and the pass-A bench artifact (92.6 s min-of-3 for
the sibling star query's session; 113.7 s for this one).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.queries.datapipe import _COS_SIGN_BITS, _t
    from datafusion_comet_spark.queries.similarity import _as_double, dot, l2_norm
    from datafusion_comet_spark.session import get_session

    reg = load_all()
    spark = get_session(app_name="dcs-embcos-ab")

    def prefix_variant(sf_dir):
        sbucket = sum(
            [
                F.when(F.col("emb").getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(_COS_SIGN_BITS)
            ],
            F.lit(0),
        )
        emb = (
            _t(spark, sf_dir, "embeddings")
            .select("vec_id", "label", _as_double("embedding").alias("emb"))
            .select("vec_id", "label", "emb", l2_norm(F.col("emb")).alias("nrm"), sbucket.alias("sbucket"))
        )
        left = emb.select(F.col("vec_id").alias("a"), "label", "sbucket", F.col("emb").alias("emb_a"), F.col("nrm").alias("nrm_a"))
        right = emb.select(F.col("vec_id").alias("b"), "label", "sbucket", F.col("emb").alias("emb_b"), F.col("nrm").alias("nrm_b"))
        return (
            left.join(right, ["label", "sbucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", F.round(dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")), 5).alias("sim"))
            .orderBy(F.col("sim").desc(), "a", "b")
            .limit(20)
        )

    sf = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1"
    reg["dedup_exact"].fn(spark, sf).collect()
    b_times, rows_b = [], None
    for _ in range(5):
        t0 = time.perf_counter()
        rows_b = reg["dedup_embedding_cosine"].fn(spark, sf).collect()
        b_times.append(round(time.perf_counter() - t0, 3))
    a_times, rows_a = [], None
    for _ in range(2):
        t0 = time.perf_counter()
        rows_a = prefix_variant(sf).collect()
        a_times.append(round(time.perf_counter() - t0, 3))
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, rows_b)), "variants disagree"
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "prefix_2task_runs": a_times,
                "postfix_rebalanced_runs": b_times,
                "min_pre": min(a_times),
                "min_post": min(b_times),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
