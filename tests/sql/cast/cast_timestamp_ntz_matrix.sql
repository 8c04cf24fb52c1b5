-- TIMESTAMP_NTZ cast matrix under the UTC-pinned session:
-- string <-> ntz, ntz <-> ltz (wall-clock preserving at UTC),
-- ntz <-> date, and rendering back to string
-- (reference: sql-tests/expressions/cast/cast_timestamp_ntz.sql and
-- cast_timestamp_ntz_ansi.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE cast('2024-03-10 02:30:00' as timestamp_ntz) = to_timestamp_ntz('2024-03-10 02:30:00')
  AND cast(cast('2024-03-10 02:30:00' as timestamp_ntz) as string) = '2024-03-10 02:30:00'
  AND cast(cast('2024-03-10 02:30:00.123456' as timestamp_ntz) as string) = '2024-03-10 02:30:00.123456'

-- date <-> ntz: midnight expansion and truncation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE cast(date'2024-03-10' as timestamp_ntz) = to_timestamp_ntz('2024-03-10 00:00:00')
  AND cast(to_timestamp_ntz('2024-03-10 23:59:59') as date) = date'2024-03-10'

-- ntz <-> ltz round-trips exactly at UTC session zone
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE cast(cast(timestamp'2024-06-01 12:00:00' as timestamp_ntz) as timestamp)
        = timestamp'2024-06-01 12:00:00'
  AND cast(cast(to_timestamp_ntz('2024-06-01 12:00:00') as timestamp) as timestamp_ntz)
        = to_timestamp_ntz('2024-06-01 12:00:00')

-- malformed strings: plain cast RAISES under ANSI, try_cast NULLs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_cast('not a timestamp' as timestamp_ntz) IS NULL
  AND try_cast('2024-13-40 00:00:00' as timestamp_ntz) IS NULL

query expect_error=CAST_INVALID_INPUT
SELECT cast('not a timestamp' as timestamp_ntz)
