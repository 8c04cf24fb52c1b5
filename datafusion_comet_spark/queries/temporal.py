"""Temporal join operators: as-of join and bounded range join.

The reference has NO as-of/range/interval join in its IR — the join oneof
stops at Inner/Outer/Semi/Anti equi joins (reference:
native/proto/src/proto/operator.proto:379-386; SURVEY.md §2.1 "Missing
from the reference").  These are the canonical event-attribution
operators a training-data/analytics pipeline needs, so we provide them
as compositions of existing DataFrame ops (SURVEY.md §7 custom-operator
policy (a)):

* **As-of join** — the distributed `merge_asof` pattern: UNION the two
  sides with a marker column, hash-partition once by key, sort within
  the partition by (time, marker), and carry the quote side forward with
  ``last(..., ignorenulls=True)`` over a running ROWS frame.  Cost is
  ONE shuffle of rows proportional to |left|+|right| — no range
  explosion, no per-key collect; at 100 TB this is a single exchange on
  the join key followed by a partition-local sort (SCALE.md).

* **Range join** — equi-key + bounded time predicate.  Spark executes
  this as a hash join on the equi key with the range as a residual
  filter, so the shuffle is keyed and the inequality never degenerates
  into a nested-loop cartesian.  (For a keyless range join the scale
  path is bucketing the time axis to manufacture an equi key; the equi
  key here plays that role.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


@register(
    "join_asof",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(ts AS TIMESTAMP) AS t,
         0 AS marker,
         event_id AS click_id,
         NULL::BIGINT AS purchase_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id,
         CAST(ts AS TIMESTAMP) AS t,
         1 AS marker,
         NULL::BIGINT AS click_id,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT user_id, t, marker, purchase_id,
         last_value(click_id IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY t, marker, click_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_id,
         last_value(CASE WHEN marker = 0 THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY t, marker, click_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS click_t
  FROM u
)
SELECT purchase_id, user_id, click_id,
       epoch_us(t) - epoch_us(click_t) AS lag_us
FROM carried
WHERE marker = 1
ORDER BY purchase_id
""",
    tags=("temporal", "join"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    click at-or-before it (ties at identical timestamps resolve to the
    click, then the highest click_id — pinned by the window ordering so
    both engines agree)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("marker"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("marker"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "marker", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(purchases).select(
        "purchase_id",
        "user_id",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last(
            F.when(F.col("marker") == 0, F.col("t")), ignorenulls=True
        )
        .over(w)
        .alias("click_t"),
        "marker",
        "t",
    )
    return (
        carried.filter(F.col("marker") == 1)
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.unix_micros("t") - F.unix_micros("click_t")).alias("lag_us"),
        )
        .orderBy("purchase_id")
    )


@register(
    "join_range",
    oracle="""
SELECT c.user_id,
       count(*) AS n_pairs,
       count(DISTINCT c.event_id) AS n_converting_clicks,
       round(CAST(sum(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE), 4) AS conv_value
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND CAST(p.ts AS TIMESTAMP) >  CAST(c.ts AS TIMESTAMP)
 AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL '1 hour'
GROUP BY c.user_id
ORDER BY c.user_id
""",
    tags=("temporal", "join"),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: (click, purchase) pairs for the same user
    with the purchase in (click_ts, click_ts + 1h].  Hash join on
    user_id with the time window as a residual predicate."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("value"),
        F.col("ts").alias("p_ts"),
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("click_id").alias("n_converting_clicks"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("conv_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_hourly_gapfill",
    oracle="""
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 23:00:00',
                                INTERVAL 1 HOUR)) AS hour
), types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n_events, round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, s.hour,
       coalesce(h.n_events, 0) AS n_events,
       coalesce(h.total_value, 0.0) AS total_value
FROM spine s CROSS JOIN types t
LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour = s.hour
ORDER BY t.event_type, s.hour
""",
    tags=("temporal", "gapfill"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup with zero-filled gaps: a literal time spine
    (sequence -> explode) cross-joined with the observed event types,
    left-joined against the aggregated counts.  Time-series gap-fill
    has no reference counterpart (no temporal operators in the IR —
    reference: native/proto/src/proto/operator.proto:38-56).

    Scale shape: the facts aggregate FIRST (map-side partials, one
    shuffle on (type, hour)); the spine is a few-KB generated dimension
    broadcast to it — the dense left join never shuffles the fact
    table a second time, and works identically when `events` is 100 TB
    because spine size depends only on the time range."""
    ev = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp'2024-01-01 00:00:00',"
                " timestamp'2024-01-30 23:00:00', interval 1 hour)"
            )
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
    )
    dense = F.broadcast(spine.crossJoin(types))
    return (
        dense.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_sessionize",
    oracle="""
WITH o AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, value,
         CASE WHEN lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR epoch_us(CAST(ts AS TIMESTAMP))
                 - epoch_us(lag(CAST(ts AS TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id))
                 > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, t, value, new_s,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM o
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(t) AS session_start,
       epoch_us(max(t)) - epoch_us(min(t)) AS duration_us,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM s
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""",
    tags=("temporal", "sessionize"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after a >30 min
    silence per user.  The canonical pattern — lag() gap flag, running
    sum of flags as the session id, then a per-session rollup.  No
    reference counterpart (no temporal/stateful operators in the IR —
    reference: native/proto/src/proto/operator.proto:38-56).

    Scale shape: ONE hash exchange on user_id serves both windows and
    the final aggregate (same partitioning reused across stages); all
    session logic is partition-local after that single shuffle, so the
    plan is identical at 100 TB — no per-user collect, no driver state.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "events_funnel",
    oracle="""
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'     THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         min(CASE WHEN event_type = 'click'    THEN CAST(ts AS TIMESTAMP) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
FROM stages
""",
    tags=("temporal", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first
    click precedes their first purchase.  Conditional-min aggregation
    collapses each user to one row (map-side partials, one shuffle on
    user_id), then a global count — the standard funnel shape that
    avoids self-joining the event log once per stage.

    Scale shape: the event table is touched ONCE; stage ordering is
    computed on the collapsed per-user row (|users| << |events|), so
    the plan cost is a single keyed aggregate regardless of event
    volume."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_purch = reached_click & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(reached_view.cast("int")).cast("bigint").alias("n_view"),
        F.sum(reached_click.cast("int")).cast("bigint").alias("n_view_click"),
        F.sum(reached_purch.cast("int"))
        .cast("bigint")
        .alias("n_view_click_purchase"),
    )


@register(
    "events_value_histogram",
    oracle="""
SELECT CAST(least(floor(value / 25.0), 13) AS INT) AS bucket,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS bucket_value,
       round(min(value), 4) AS lo,
       round(max(value), 4) AS hi
FROM events
GROUP BY bucket
ORDER BY bucket
""",
    tags=("temporal", "histogram"),
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value distribution: bucket
    index computed inline (floor-divide + clamp), one hash aggregate.
    The distributed-histogram shape: no sort, no window — a 100 TB
    scan collapses map-side into at most 14 groups before the
    exchange, so the shuffle is bytes-sized regardless of input."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(13)).cast("int")
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("bucket_value"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "events_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
  FROM events
  GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day,
                      CAST(date_trunc('day', e.ts) AS DATE)) AS INT) AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e
JOIN firsts f ON e.user_id = f.user_id
WHERE date_diff('day', f.cohort_day,
                CAST(date_trunc('day', e.ts) AS DATE)) BETWEEN 0 AND 7
GROUP BY f.cohort_day, day_offset
ORDER BY f.cohort_day, day_offset
""",
    tags=("temporal", "events", "retention"),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: bucket users by first-seen day, count distinct
    returning users at day offsets 0–7.  First-seen is a window
    min(day) over user_id — ONE hash exchange of the event table total
    (the groupBy + join-back spelling the oracle uses would scan and
    shuffle events twice: per-branch pruning defeats exchange reuse);
    only the final (cohort, offset) rollup reshuffles, and that output
    is tiny (days × 8 rows) at any corpus size."""
    from pyspark.sql import Window as _W

    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    w = _W.partitionBy("user_id")
    joined = events.select(
        "user_id",
        F.min("day").over(w).alias("cohort_day"),
        F.datediff("day", F.min("day").over(w)).alias("day_offset"),
    )
    return (
        joined.filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', ts) AS hour,
         count(*) AS n
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
scored AS (
  SELECT event_type, hour, n,
         avg(n)    OVER (PARTITION BY event_type) AS mu,
         stddev_samp(n) OVER (PARTITION BY event_type) AS sigma
  FROM hourly
)
SELECT event_type,
       CAST(hour AS TIMESTAMP) AS hour,
       CAST(n AS BIGINT) AS n,
       round((n - mu) / sigma, 4) AS z
FROM scored
WHERE abs((n - mu) / sigma) > 2.0
ORDER BY event_type, hour
""",
    tags=("temporal", "events", "anomaly", "window-over-agg"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly event counts z-scored against
    the per-type mean/stddev, flag |z| > 2.  The window runs over the
    hourly AGGREGATE (types × hours rows), so the event log is shuffled
    once for the groupBy and the anomaly scoring touches only the tiny
    summary — the shape that keeps a 100 TB log scan out of the window
    operator."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type")
    scored = hourly.select(
        "*",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(F.abs(z) > 2.0)
        .select(
            "event_type",
            "hour",
            F.col("n").cast("bigint").alias("n"),
            F.round(z, 4).alias("z"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "join_range_bucketed",
    oracle="""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
FROM (SELECT event_id, ts FROM events WHERE event_type = 'click'
       AND user_id < 40) c
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= c.ts AND p.ts < c.ts + INTERVAL 10 MINUTE
ORDER BY click_id, purchase_id
""",
    tags=("temporal", "join", "range", "bucketed"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS range join via manufactured equi key: pair every click
    with purchases in the following 10 minutes, with NO shared key —
    the case where a naive range predicate degenerates to a nested
    loop over the full cross product.  The scale fix (SCALE.md): bucket
    the time axis at the window width (600 s), explode the narrow side
    into its two candidate buckets (b, b+1), hash-join on the bucket,
    and apply the range as a residual.  Fan-out is 2×, the join is a
    keyed shuffle, and correctness is exact — the DuckDB oracle runs
    the plain range join."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / 600).cast("long")
    clicks = (
        ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 40))
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        bucket.alias("bucket"),
    )
    return (
        clicks.join(purchases, "bucket")
        .filter(
            (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 10 MINUTE"))
        )
        .select(
            "click_id",
            "purchase_id",
            (
                F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
            ).cast("bigint").alias("lag_s"),
        )
        # no distinct needed: a purchase's bucket equals exactly one of
        # the click's two candidate buckets, so each pair joins once
        .orderBy("click_id", "purchase_id")
    )


# --------------------------------------------------------------------------
# Batch time windows — the batch counterparts of the streaming windowed
# aggregations (stream_window_agg / stream_session_window).  The
# reference has NO time-window operator at all (its IR stops at equi
# joins + hash aggregate, reference: native/proto/src/proto/operator.proto:38-56);
# Spark's F.window / F.session_window are Catalyst-native generators
# that compile to a Project (tumbling) / Expand (sliding), so they stay
# inside whole-stage codegen and aggregate with one keyed shuffle.
# --------------------------------------------------------------------------
@register(
    "events_tumbling_window",
    oracle="""
SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS win_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("temporal", "window", "tumbling"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 30-minute windowed aggregation with ``F.window`` — the
    batch form of the streaming window rollup.  Epoch-aligned buckets
    (Spark aligns to 1970-01-01; DuckDB's time_bucket to 2000-01-01 —
    the offset is a whole number of 30-minute periods, so the bucket
    edges coincide).

    Scale shape: window assignment is a per-row projection (no
    Expand for tumbling windows), then a standard two-phase hash
    aggregate — one shuffle on (window, type), partials map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "events_session_window_batch",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_last,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    tags=("temporal", "window", "session"),
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with the native ``F.session_window``
    generator (30-minute inactivity gap) — the operator form of the
    lag/cumsum gaps-and-islands rewrite used by `events_sessionize`
    (both plans are verified against the same islands oracle).

    Scale shape: Spark plans session_window as a partition-local
    merge of overlapping candidate sessions after ONE shuffle on
    user_id — same exchange count as the manual rewrite, but the
    session merge runs inside the aggregate operator instead of two
    window passes.  `window.end` is (last event + gap) by definition,
    so the oracle-comparable "last event" is end - 30 min."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr("INTERVAL 30 MINUTE")).alias(
                "session_last"
            ),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# --------------------------------------------------------------------------
# Materialized-rollup cascade and changelog compaction — the two
# maintenance loops every 100 TB event store runs continuously.  The
# reference has neither (its IR is stateless scan→join→agg, reference:
# native/proto/src/proto/operator.proto:38-56); both are compositions
# of one keyed exchange + windows/aggregates.
# --------------------------------------------------------------------------
@register(
    "rollup_reaggregate",
    oracle="""
WITH hourly AS (
  SELECT event_type,
         date_trunc('hour', ts) AS hr,
         sum(CAST(value AS DECIMAL(18,6))) AS sum_value,
         count(*) AS cnt
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(date_trunc('day', hr) AS DATE) AS day,
       CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(round(sum(sum_value), 6) AS DOUBLE) AS total_value,
       round(CAST(sum(sum_value) AS DOUBLE) / sum(cnt), 6) AS avg_value
FROM hourly
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("temporal", "rollup", "aggregate"),
)
def rollup_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: the DAILY rollup is derived
    from the HOURLY rollup, never from the raw events — the
    aggregate-of-aggregates contract that makes materialized rollups
    maintainable (carry mergeable states sum/count; derive avg at
    read time; avg-of-avgs would be wrong and is structurally
    impossible here because the hourly table doesn't store an avg).

    Scale shape: pass 1 is the ordinary two-phase hash aggregate over
    events (one shuffle, map-side partials); pass 2 re-aggregates
    |event_types| x |hours| rows — at 100 TB the hourly table is ~6
    orders of magnitude smaller than the fact, so cascade cost is
    dominated by pass 1, exactly once, and pass 1 is the thing an
    incremental pipeline materializes per arriving partition.  Sums
    are DECIMAL so the mergeable state is exact — the cascade's
    result cannot depend on partial-aggregation order.  The exact
    decimal stays INTERNAL: at the output boundary the total is
    rounded once and emitted as double (tpch.py _money convention —
    a raw DECIMAL(28,6) output is int128-backed and renders
    differently through the two engines' pandas round-trips)."""
    ev = load_table(spark, sf_dir, "events")
    # DECIMAL sums: exact and associative, so the cascade's result is
    # independent of partial-aggregation order (a double sum rounds
    # differently run-to-run at rounding boundaries — caught at sf0.01)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "hr").cast("date").alias("day")
        )
        .agg(
            F.sum("cnt").alias("n_events"),
            F.round(F.sum("sum_value"), 6).cast("double").alias("total_value"),
            F.round(
                F.sum("sum_value").cast("double") / F.sum("cnt"), 6
            ).alias("avg_value"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "cdc_apply_changes",
    oracle="""
WITH ranked AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id,
       ts AS last_ts,
       event_type AS last_event_type,
       value AS last_value,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked
WHERE rn = 1 AND op = 'U'
ORDER BY user_id
""",
    tags=("temporal", "cdc", "window"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction (CDC apply-changes): collapse a change
    stream to the latest surviving row per key — latest-wins by
    (ts, event_id), keys whose LAST change is a delete disappear.
    The events log stands in as the changelog ('error' = delete
    tombstone, everything else upserts).

    This is the snapshot-compaction half of the upsert story
    (`merge_upsert` is the other half: folding a compacted delta into
    an existing base by full-outer join).  Scale shape: ONE exchange
    on the key; row_number and the per-key change count share the
    same window partition, so both compute in a single Window
    operator with no second shuffle, and the rn=1 filter prunes via
    WindowGroupLimit before the count consumes it is NOT possible
    (the count needs all rows) — the optimizer correctly keeps the
    full window, which is the honest cost of emitting n_changes.
    Tombstone deletion is a post-window filter, never a join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("n_changes").cast("long").alias("n_changes"),
        )
        .orderBy("user_id")
    )


@register(
    "rollup_incremental_update",
    oracle="""
SELECT event_type,
       date_trunc('hour', ts) AS hr,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("temporal", "rollup", "incremental"),
)
def rollup_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup MAINTENANCE loop: yesterday's materialized hourly
    rollup + today's delta, merged by RE-AGGREGATING the mergeable
    states (sum of sums, sum of counts) — and the invariant the oracle
    enforces is that incremental == full recompute, exactly.

    The split is simulated by time (first half of the stream is the
    'existing' table, second half the 'arriving' delta); both halves
    aggregate independently — as they would on different days — then
    unionByName + one re-aggregate merges overlapping (type, hour)
    groups.  Decimal states make the merge exact regardless of how
    many increments the history accumulated (SCALE.md determinism
    note).  At 100 TB: the delta aggregate touches only the arriving
    partition, the merge re-aggregates |rollup| rows, and the fact
    table's history is NEVER rescanned — that is the entire point of
    carrying mergeable states instead of finished ratios.

    The split cutoff is a broadcast scalar subquery (1-row min/max
    agg cross-joined in), not a driver-side .first(): the whole
    query stays one Catalyst plan.  The decimal state is internal;
    the merged sum is rounded once and emitted as double at the
    output boundary (tpch.py _money convention)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.timestamp_micros(
            (
                (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts")))
                / F.lit(2)
            ).cast("long")
        ).alias("cutoff")
    )
    ev = ev.crossJoin(F.broadcast(bounds))

    def hourly(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )

    existing = hourly(ev.filter(F.col("ts") < F.col("cutoff")))
    delta = hourly(ev.filter(F.col("ts") >= F.col("cutoff")))
    merged = (
        existing.unionByName(delta)
        .groupBy("event_type", "hr")
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.round(F.sum("sum_value"), 6).cast("double").alias("sum_value"),
        )
    )
    return merged.orderBy("event_type", "hr")


@register(
    "join_asof_forward_tolerance",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(ts AS TIMESTAMP) AS t,
         0 AS marker,
         event_id AS click_id,
         NULL::BIGINT AS purchase_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id,
         CAST(ts AS TIMESTAMP) AS t,
         1 AS marker,
         NULL::BIGINT AS click_id,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
), carried AS (
  SELECT user_id, t, marker, click_id,
         last_value(purchase_id IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY t DESC, marker DESC, purchase_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS next_purchase_id,
         last_value(CASE WHEN marker = 1 THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY t DESC, marker DESC, purchase_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS next_purchase_t
  FROM u
)
SELECT click_id, user_id,
       CASE WHEN next_purchase_t IS NOT NULL
                 AND epoch_us(next_purchase_t) - epoch_us(t)
                     <= CAST(604800000000 AS BIGINT)
            THEN next_purchase_id END AS purchase_id,
       CASE WHEN next_purchase_t IS NOT NULL
                 AND epoch_us(next_purchase_t) - epoch_us(t)
                     <= CAST(604800000000 AS BIGINT)
            THEN epoch_us(next_purchase_t) - epoch_us(t) END AS lag_us
FROM carried
WHERE marker = 0
ORDER BY click_id
""",
    tags=("temporal", "join"),
)
def join_asof_forward_tolerance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forward as-of join with a tolerance bound: each click attributed
    to the user's NEXT purchase at-or-after it, but only within a
    7-day attribution window — the pandas ``merge_asof(direction=
    'forward', tolerance=...)`` semantics, completing the direction
    matrix with `join_asof` (backward).  Ties at identical timestamps
    resolve to the purchase, then the LOWEST purchase_id: the window
    scans t DESC with purchase_id DESC, so the last purchase row in
    frame order at a tied timestamp is the smallest id — pinned by the
    identical window ordering in both engines.

    Same scale shape as the backward form: ONE union + ONE per-user
    window (the forward direction is just the reverse sort order —
    no self-join, no range explosion); the tolerance is a post-window
    filter, so widening the window changes no exchange.  At 100 TB
    this is one hash exchange on user_id regardless of direction or
    tolerance."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("marker"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("marker"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("t").desc(),
            F.col("marker").desc(),
            F.col("purchase_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(purchases).select(
        "click_id",
        "user_id",
        "marker",
        "t",
        F.last("purchase_id", ignorenulls=True).over(w)
        .alias("next_purchase_id"),
        F.last(
            F.when(F.col("marker") == 1, F.col("t")), ignorenulls=True
        )
        .over(w)
        .alias("next_purchase_t"),
    )
    lag = F.unix_micros("next_purchase_t") - F.unix_micros("t")
    within = F.col("next_purchase_t").isNotNull() & (
        lag <= 7 * 86400 * 1_000_000
    )
    return (
        carried.filter(F.col("marker") == 0)
        .select(
            "click_id",
            "user_id",
            F.when(within, F.col("next_purchase_id")).alias("purchase_id"),
            F.when(within, lag).alias("lag_us"),
        )
        .orderBy("click_id")
    )
