"""AQE skew-join splitting — the runtime half of the skew story.

`join_skew_salted` pins the MANUAL mitigation (salting).  This suite
pins the AUTOMATIC one: with `spark.sql.adaptive.skewJoin.enabled`
(on in the engine's defaults, session.py), a sort-merge join whose
shuffle produces one oversized partition must be re-planned at runtime
with that partition split (`skew=true` marker on the join) — and the
split must not change the result.  At 100 TB this is the difference
between one straggler task holding the stage for hours and N parallel
tasks; the reference leaves skew handling entirely to Spark/AQE
(SURVEY §4.1), so this behavior IS part of the rebuilt engine's
contract.

Thresholds are lowered to make a ~40 MB test shuffle exhibit what a
multi-GB production partition would: skewedPartitionThresholdInBytes
and advisoryPartitionSizeInBytes scale together (the former must stay
>= the latter or AQE ignores the skew).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _conf(spark, settings: dict[str, str]):
    saved = {}
    for k, v in settings.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    # left: 400k rows, ~95% on hot key 0; right: 40k rows uniform over
    # 1k keys with a payload wide enough to defeat tiny-size estimates.
    left = spark.range(0, 400_000).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("lpad"),
    )
    right = spark.range(0, 40_000).select(
        (F.col("id") % 1000).alias("k"),
        F.sha2((F.col("id") + 7).cast("string"), 256).alias("rpad"),
    )
    settings = {
        # force a shuffle join (no broadcast escape hatch)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # make test-sized partitions eligible for skew splitting
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        # keep AQE from coalescing everything into one partition first
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    }
    with _conf(spark, settings):
        # Aggregate ON the join output and read THAT DataFrame's own
        # executed plan: df.count() executes a different QueryExecution,
        # whose AQE final plan this test would never see.  min(lpad/rpad)
        # keeps the wide payload columns from being pruned, so shuffle
        # partition byte sizes stay realistic.
        res = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lpad").alias("lmin"),
            F.min("rpad").alias("rmin"),
        )
        n = res.collect()[0]["n"]
        # Public-API plan capture: DataFrame.explain() prints the
        # (post-execution, isFinalPlan=true) AQE plan Python-side, so
        # redirect_stdout sees it — no private queryExecution() poking.
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            res.explain(mode="extended")
        plan = buf.getvalue()
    # result correctness: hot key 0 matches 40 right rows, every other
    # key k matches 40 right rows too (uniform 1k keys, 40 each)
    hot_left = 400_000 * 19 // 20
    cold_left = 400_000 - hot_left
    assert n == hot_left * 40 + cold_left * 40, n
    # "skew=true" is the SortMergeJoin marker AQE's OptimizeSkewedJoin
    # emits in Spark 4.1's plan string (pinned to the pyspark version
    # in this container; the marker has been stable since Spark 3.0,
    # SPARK-29544).
    assert "skew=true" in plan, (
        "AQE did not mark the skewed join partition for splitting:\n"
        + plan[:2000]
    )
