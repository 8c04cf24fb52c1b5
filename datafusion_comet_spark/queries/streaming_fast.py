"""Fast streaming representative (driver-prefix visible).

The full streaming family (queries/streaming.py) registers LAST in
load_all because every entry executes a multi-second availableNow run
with stateful operators (watermark state stores, session windows) —
too slow for the driver's 50-query sampled prefix.  This module holds
deliberately FAST representatives (single microbatch, memory sink,
pinned state partitions) registered early enough that the streaming
capability gets driver-checked CORRECTNESS rows: one stateless
(filter/project) plus one per stateful state-store format —
aggregation (tumbling window), dedup (dropDuplicates), and join
(watermarked time-range stream-stream join) — and, since round 9,
one STATE-INTROSPECTION query per format reading the committed
checkpoint back through the built-in state data source
(stream_state_store_reader / stream_state_dedup_keys /
stream_state_join_buffers).

Capability superset vs the reference, which rejects streaming plans
outright (reference:
spark/src/main/scala/org/apache/comet/rules/CometExecRule.scala:548-550).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    read_events_stream,
    run_to_checkpoint,
    run_to_memory,
    run_to_state,
)
from . import register


@register(
    "stream_fast_filter_project",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE value > 0.5 AND event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
""",
    tags=("streaming", "fast", "stateless"),
)
def stream_fast_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming ETL: filter + project in the stream (append
    mode, no watermark, no state store — the fastest possible
    Structured Streaming shape), then a batch rollup over the sink.

    This is the landing-zone ingest pattern at 100 TB: per-file map-only
    transforms run in the stream with zero shuffle and zero state; the
    aggregation happens downstream over the materialized sink.  The
    integer-cents sum keeps the oracle comparison float-exact."""
    ev = read_events_stream(spark, sf_dir).filter(
        (F.col("value") > 0.5)
        & F.col("event_type").isin("click", "purchase")
    )
    slim = ev.select(
        "event_id",
        "event_type",
        # floor() before the cast: Spark's double→bigint cast truncates
        # while DuckDB's rounds — floor is identical in both engines.
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    out = run_to_memory(slim, "stream_fast_fp_sink", "append")
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .orderBy("event_type")
    )


@register(
    "stream_fast_window_agg",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hr,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("streaming", "fast", "stateful", "window"),
)
def stream_fast_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming in one fast pass: a tumbling 1-hour window
    aggregation computed IN the stream (state store holds the open
    windows), complete-mode memory sink, single availableNow
    microbatch — the smallest shape that exercises streaming
    aggregation state, complementing stream_fast_filter_project's
    stateless row.  The batch oracle is the same rollup because a
    1-hour tumbling window's start IS date_trunc('hour', ts).

    At 100 TB the same plan runs with a watermark so state evicts
    (the slow streaming family pins eviction); complete mode here
    keeps the single-batch run deterministic.  The window START is
    emitted as a string at hour granularity — never the raw ns
    timestamp (TESTDATA.md ns-vs-us hazard)."""
    ev = read_events_stream(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    agg = (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100).cast("bigint")
            ).cast("bigint").alias("cents"),
        )
    )
    out = run_to_memory(agg, "stream_fast_wa_sink", "complete")
    return (
        out.select(
            F.col("w.start").cast("string").alias("hr"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "cents",
        )
        .orderBy("hr", "event_type")
    )


@register(
    "stream_fast_dedup",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
ORDER BY event_type
""",
    tags=("streaming", "fast", "stateful", "dedup"),
)
def stream_fast_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication state in one fast pass: dropDuplicates
    over (user_id, event_type) IN the stream — the dedup state store
    holds one entry per seen key, the third distinct stateful-operator
    state format after aggregation (stream_fast_window_agg) and join
    (stream_fast_stream_join).  Only the KEY columns are projected
    before the dedup, so the output is deterministic (which physical
    row survives per key is arrival-order dependent; the key set is
    not) and equals batch SELECT DISTINCT.

    This is the streaming face of the exact-dedup pipeline operator:
    at 100 TB/day the same plan runs dropDuplicatesWithinWatermark so
    key state evicts after the dedup horizon (the slow family's
    stream_dedup_within_watermark pins eviction); unbounded-state
    dedup here keeps the single-batch run oracle-comparable."""
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    out = run_to_memory(
        deduped, "stream_fast_dd_sink", "append", shuffle_partitions=4
    )
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "stream_fast_stream_join",
    oracle="""
SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND c.user_id < 60
 AND CAST(p.ts AS TIMESTAMP) >  CAST(c.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '15 minutes'
GROUP BY c.user_id
ORDER BY c.user_id
""",
    tags=("streaming", "fast", "stateful", "stream-stream-join"),
)
def stream_fast_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join in one fast pass: clicks matched to the
    purchases that follow within 15 minutes, both sides watermarked so
    join state evicts past the time-range bound — the JOIN state-store
    path, complementing the aggregation-state and dedup-state fast
    representatives.  The user_id < 60 slice is a plain pushdown
    predicate that bounds the work at any scale factor (it reaches
    both parquet scans before the state store), so the query stays
    sub-3s while exercising exactly the plan a production
    clicks×purchases attribution join runs: per-key state bounded by
    watermark + range (15 min of stream per key), independent of
    total stream length.  Single availableNow microbatch → every
    match is emitted in-batch and the result equals the batch
    time-range join oracle."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter((F.col("event_type") == "click") & (F.col("user_id") < 60))
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "15 minutes")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") < 60))
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "15 minutes")
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 15 MINUTES")),
        "inner",
    )
    out = run_to_memory(
        pairs.select("user_id", "c_ts", "p_ts"),
        "stream_fast_ssj_sink",
        "append",
        shuffle_partitions=4,
    )
    return (
        out.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "stream_state_store_reader",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE event_type IN ('click', 'purchase', 'view')
GROUP BY event_type
ORDER BY event_type
""",
    tags=("streaming", "fast", "stateful", "introspection"),
)
def stream_state_store_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store INTROSPECTION: run a stateful streaming aggregation
    to completion, then read its committed state back through Spark's
    built-in state data source (``format("statestore")``, core since
    4.0) and verify the state equals the batch aggregate of the input.

    Capability superset vs the reference, which rejects streaming
    plans entirely (reference:
    spark/src/main/scala/org/apache/comet/rules/CometExecRule.scala:548-550)
    and has no state-introspection surface at all.

    At 100 TB this is the operational debugging path: the state source
    reads ONLY the checkpoint's latest committed snapshot (O(state),
    never O(input history)), so "which keys are accumulating?" costs a
    scan of k rows of state, not a replay of the stream.  The oracle
    proves the round-trip: streaming agg buffers --(state files)-->
    state source == one batch GROUP BY over the same input.

    The state rows expose (key struct, value struct, partition_id);
    the value struct's fields carry the PHYSICAL buffer names
    (``count``, ``sum``) — aggregate aliases exist only above the
    state store.  partition_id is dropped — it is an artifact of the
    pinned shuffle-partition count, not of the data."""
    ev = read_events_stream(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase", "view")
    )
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    state = run_to_state(
        agg, "stream_state_reader_sink", "complete", shuffle_partitions=4
    )
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("bigint").alias("n"),
            F.col("value.sum").cast("bigint").alias("cents"),
        )
        .orderBy("event_type")
    )


@register(
    "stream_state_dedup_keys",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT DISTINCT user_id, event_type FROM events) t
GROUP BY event_type
ORDER BY event_type
""",
    tags=("streaming", "fast", "stateful", "introspection"),
)
def stream_state_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State introspection for the DEDUP state-store format: run
    dropDuplicates in the stream, then read the key set back from the
    checkpoint via the state data source.  The dedup store holds one
    entry PER SEEN KEY with an empty value payload — so the state
    rows' key structs ARE the distinct set, and re-aggregating them
    must equal the batch SELECT DISTINCT oracle.

    Together with stream_state_store_reader (aggregation buffers) this
    pins the second of the stateful formats through the introspection
    path.  The operational question it answers at 100 TB is state-size
    attribution: "how many dedup keys is each event_type holding?"
    costs one O(state) scan of the checkpoint, no input replay."""
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    state = run_to_state(
        deduped, "stream_state_dd_sink", "append", shuffle_partitions=4
    )
    return (
        state.select(
            F.col("key.user_id").alias("user_id"),
            F.col("key.event_type").alias("event_type"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "stream_state_join_buffers",
    oracle="""
SELECT side, n, nk FROM (
  SELECT 'left' AS side,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT user_id) AS BIGINT) AS nk
  FROM events WHERE event_type = 'click' AND user_id < 60
  UNION ALL
  SELECT 'right' AS side,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT user_id) AS BIGINT) AS nk
  FROM events WHERE event_type = 'purchase' AND user_id < 60
) t ORDER BY side
""",
    tags=("streaming", "fast", "stateful", "introspection"),
)
def stream_state_join_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State introspection for the JOIN state-store format — the third
    and last stateful format after aggregation buffers
    (stream_state_store_reader) and dedup keys
    (stream_state_dedup_keys): read BOTH sides' buffered rows back
    with ``option("joinSide", ...)`` and prove each buffer equals the
    side's full filtered input.

    The join deliberately carries NO watermark: an inner stream-stream
    join without one buffers every input row indefinitely (Spark
    allows it with an unbounded-state warning), which makes the
    buffered set exactly SQL-expressible — count and distinct-key per
    side.  Watermark EVICTION is pinned by the slow streaming family
    (stream_stream_join/left_outer/full_outer); this query pins what
    the state source exposes.

    The oracle also pins a state-SIZE optimization this query caught
    in the measured plan: Catalyst propagates the left side's
    ``user_id < 60`` through the equi-join condition onto the RIGHT
    stream (InferFiltersFromConstraints), so the right buffer holds
    only the 60 matchable users' purchases, not all 150 users' — the
    engine refuses to buffer rows that can never join.  At 100 TB
    that inference IS the state bound for selective joins, and the
    operational question this query answers is state-imbalance
    triage: "which side's buffer is exploding, and over how many
    keys?" — one O(state) scan per side, no replay."""
    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 60)
    ).select("user_id", F.col("ts").alias("c_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user)
        & (purchases.p_ts > clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("interval 15 minutes")),
    )
    ckpt = run_to_checkpoint(
        joined, "stream_state_jb_sink", "append", shuffle_partitions=4
    )

    def side_stats(side: str, key_field: str) -> DataFrame:
        st = (
            spark.read.format("statestore")
            .option("joinSide", side)
            .load(ckpt)
        )
        return st.select(
            F.lit(side).alias("side"),
            F.col(f"value.{key_field}").alias("k"),
        ).groupBy("side").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("k").cast("bigint").alias("nk"),
        )

    return (
        side_stats("left", "user_id")
        .unionByName(side_stats("right", "p_user"))
        .orderBy("side")
    )
