-- The epoch-precision constructor/extractor family:
-- timestamp_millis/timestamp_micros and unix_seconds/millis/micros,
-- including negative (pre-1970) epochs and the floor-toward
-- -infinity truncation of unix_seconds
-- (reference: sql-tests/expressions/datetime/{timestamp_seconds,
-- unix_timestamp,date_from_unix_date,unix_date}.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestamp_millis(1000) = timestamp'1970-01-01 00:00:01Z'
  AND timestamp_micros(1000000) = timestamp'1970-01-01 00:00:01Z'
  AND timestamp_millis(-1) = timestamp'1969-12-31 23:59:59.999Z'
  AND timestamp_micros(-1) = timestamp'1969-12-31 23:59:59.999999Z'

-- extractors invert the constructors exactly
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE unix_seconds(timestamp'1970-01-01 00:00:01Z') = 1
  AND unix_millis(timestamp'1970-01-01 00:00:00.0015Z') = 1
  AND unix_micros(timestamp'1970-01-01 00:00:00.000001Z') = 1
  AND unix_millis(timestamp_millis(123456789)) = 123456789
  AND unix_micros(timestamp_micros(-987654321)) = -987654321

-- unix_seconds FLOORS toward -infinity: half a second before the
-- epoch is second -1, not 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE unix_seconds(timestamp'1969-12-31 23:59:59.5Z') = -1
  AND unix_millis(timestamp'1969-12-31 23:59:59.9995Z') = -1

-- the date-side pair: unix_date / date_from_unix_date around day 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE unix_date(date'1970-01-01') = 0
  AND unix_date(date'1969-12-31') = -1
  AND date_from_unix_date(-1) = date'1969-12-31'
  AND date_from_unix_date(unix_date(date'2024-02-29')) = date'2024-02-29'

-- NULL propagation across the family
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestamp_millis(cast(NULL as bigint)) IS NULL
  AND unix_micros(cast(NULL as timestamp)) IS NULL
  AND date_from_unix_date(cast(NULL as int)) IS NULL
