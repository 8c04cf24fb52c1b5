-- TIMESTAMP_NTZ (no time zone) semantics: construction via
-- to_timestamp_ntz / make_timestamp_ntz / cast, the wall-clock
-- preserving cast from LTZ under the UTC-pinned session, date
-- truncation, and convert_timezone's 3-arg NTZ->NTZ form
-- (reference: sql-tests/expressions/cast/cast_timestamp_ntz.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_timestamp_ntz('2024-03-10 02:30:00') = cast('2024-03-10 02:30:00' as timestamp_ntz)
  AND make_timestamp_ntz(2024, 3, 10, 2, 30, 0) = to_timestamp_ntz('2024-03-10 02:30:00')
  AND typeof(to_timestamp_ntz('2024-03-10 02:30:00')) = 'timestamp_ntz'

-- NTZ represents the LOCAL wall clock: 02:30 on a US DST-gap date is
-- a perfectly valid NTZ value (it only vanishes in zoned time)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hour(to_timestamp_ntz('2024-03-10 02:30:00')) = 2
  AND minute(to_timestamp_ntz('2024-03-10 02:30:00')) = 30
  AND cast(to_timestamp_ntz('2024-03-10 02:30:00') as date) = date'2024-03-10'

-- LTZ -> NTZ cast keeps the session-zone wall clock (UTC-pinned
-- session: identical digits)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE cast(timestamp'2024-06-01 12:00:00' as timestamp_ntz) = to_timestamp_ntz('2024-06-01 12:00:00')
  AND cast(to_timestamp_ntz('2024-06-01 12:00:00') as timestamp) = timestamp'2024-06-01 12:00:00'

-- convert_timezone(src, tgt, ntz): NY is UTC-4 in June (EDT)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE convert_timezone('UTC', 'America/New_York', to_timestamp_ntz('2024-06-01 12:00:00'))
        = to_timestamp_ntz('2024-06-01 08:00:00')
  AND convert_timezone('America/New_York', 'UTC', to_timestamp_ntz('2024-06-01 08:00:00'))
        = to_timestamp_ntz('2024-06-01 12:00:00')

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_timestamp_ntz(NULL) IS NULL
  AND cast(cast(NULL as timestamp) as timestamp_ntz) IS NULL
