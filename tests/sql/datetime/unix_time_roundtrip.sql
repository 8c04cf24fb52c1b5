-- Unix-epoch conversion family (session pinned UTC): unix_timestamp /
-- from_unixtime / timestamp_seconds / unix_date / date_from_unix_date.
-- DuckDB spells these epoch()/to_timestamp(), so Spark's grammar is
-- value-pinned; the epoch arithmetic itself is engine-independent.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE unix_timestamp(TIMESTAMP '2020-03-05 12:00:00') = 1583409600
  AND from_unixtime(1583409600) = '2020-03-05 12:00:00'
  AND timestamp_seconds(1583409600) = TIMESTAMP '2020-03-05 12:00:00'

-- round trips are identities
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE timestamp_seconds(unix_timestamp(TIMESTAMP '1999-12-31 23:59:59')) = TIMESTAMP '1999-12-31 23:59:59'
  AND from_unixtime(to_unix_timestamp('2020-03-05', 'yyyy-MM-dd'), 'yyyy-MM-dd') = '2020-03-05'

-- date <-> epoch-days
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE unix_date(DATE '2020-03-05') = 18326
  AND date_from_unix_date(18326) = DATE '2020-03-05'
  AND unix_date(DATE '1970-01-01') = 0
  AND date_from_unix_date(-1) = DATE '1969-12-31'

-- datediff / date_diff: 2-arg day count (DuckDB's is 3-arg — COMPAT.md)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE datediff(DATE '2020-02-01', DATE '2020-01-01') = 31
  AND date_diff(DATE '2020-01-01', DATE '2020-02-01') = -31
