-- Timezone-conversion edge matrix around DST transitions
-- (reference class: .../expressions/datetime/trunc_timestamp_dst.sql,
-- trunc_timestamp_dst_ambiguous.sql — the reference tests session-tz
-- truncation across transitions; this corpus pins the session to UTC
-- (SCALE.md) so the testable surface is the EXPLICIT conversion
-- functions, where DST edges live regardless of session tz).
-- Values pinned from Spark 4 with java.time rules (IANA tzdata);
-- spark_only — DuckDB needs the ICU extension for named zones.

-- spring forward (America/New_York, 2024-03-10 02:00 local skips to
-- 03:00): one UTC second before the gap renders 01:59:59, the next
-- second lands at 03:00:00 — local 02:xx never exists
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(from_utc_timestamp(TIMESTAMP'2024-03-10 06:59:59',
                              'America/New_York') AS STRING)
      = '2024-03-10 01:59:59'
  AND CAST(from_utc_timestamp(TIMESTAMP'2024-03-10 07:00:00',
                              'America/New_York') AS STRING)
      = '2024-03-10 03:00:00'

-- fall back (2024-11-03 02:00 local repeats 01:00-02:00): two
-- DIFFERENT UTC instants render the same local 01:30:00 — the
-- conversion is non-injective and downstream grouping on converted
-- local time merges the two hours
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(from_utc_timestamp(TIMESTAMP'2024-11-03 05:30:00',
                              'America/New_York') AS STRING)
      = '2024-11-03 01:30:00'
  AND CAST(from_utc_timestamp(TIMESTAMP'2024-11-03 06:30:00',
                              'America/New_York') AS STRING)
      = '2024-11-03 01:30:00'

-- the inverse direction must PICK for ambiguous/nonexistent locals:
-- ambiguous 01:30 (fall-back) resolves to the EARLIER offset (EDT,
-- -04:00 -> 05:30Z); nonexistent 02:30 (spring-forward) shifts
-- forward through the gap (renders as if EST, -05:00 -> 07:30Z)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(to_utc_timestamp(TIMESTAMP'2024-11-03 01:30:00',
                            'America/New_York') AS STRING)
      = '2024-11-03 05:30:00'
  AND CAST(to_utc_timestamp(TIMESTAMP'2024-03-10 02:30:00',
                            'America/New_York') AS STRING)
      = '2024-03-10 07:30:00'
  AND CAST(make_timestamp(2024, 3, 10, 2, 30, 0,
                          'America/New_York') AS STRING)
      = '2024-03-10 07:30:00'

-- non-hour offsets survive conversion (Asia/Kolkata +05:30)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(from_utc_timestamp(TIMESTAMP'2024-06-01 00:00:00',
                              'Asia/Kolkata') AS STRING)
      = '2024-06-01 05:30:00'

-- convert_timezone (3-arg, Spark 3.5+): EU transition 2024-03-31
-- 02:00 CET -> 03:00 CEST, one second apart across the gap
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(convert_timezone('UTC', 'Europe/Paris',
                            TIMESTAMP'2024-03-31 00:59:59') AS STRING)
      = '2024-03-31 01:59:59'
  AND CAST(convert_timezone('UTC', 'Europe/Paris',
                            TIMESTAMP'2024-03-31 01:00:00') AS STRING)
      = '2024-03-31 03:00:00'

-- round trip is identity only OUTSIDE gaps/overlaps
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(to_utc_timestamp(from_utc_timestamp(
             TIMESTAMP'2024-07-04 12:00:00', 'America/New_York'),
             'America/New_York') AS STRING)
      = '2024-07-04 12:00:00'
