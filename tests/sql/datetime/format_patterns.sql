-- date_format / to_date / to_timestamp pattern surface (Spark's
-- java.time patterns; DuckDB uses strftime %-codes, so Spark grammar
-- is value-pinned).  Note: 'w' (week-of-year) is REJECTED by Spark 3+
-- pattern recognition (INCONSISTENT_BEHAVIOR_CROSS_VERSION) — use
-- weekofyear() instead; that rejection is itself the compat fact.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE date_format(TIMESTAMP '2020-03-05 14:07:09', 'yyyy-MM-dd HH:mm:ss') = '2020-03-05 14:07:09'
  AND date_format(DATE '2020-03-05', 'E') = 'Thu'
  AND date_format(DATE '2020-03-05', 'D') = '65'
  AND date_format(DATE '2020-03-05', 'QQQ') = 'Q1'

-- 12-hour clock with AM/PM marker
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE date_format(TIMESTAMP '2020-03-05 14:07:09', 'hh:mm a') = '02:07 PM'
  AND date_format(TIMESTAMP '2020-03-05 00:30:00', 'hh:mm a') = '12:30 AM'

-- parse directions with explicit patterns
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_date('05/03/2020', 'dd/MM/yyyy') = DATE '2020-03-05'
  AND to_timestamp('2020-03-05 14:07', 'yyyy-MM-dd HH:mm') = TIMESTAMP '2020-03-05 14:07:00'
  AND try_to_timestamp('bogus', 'yyyy-MM-dd') IS NULL

-- format/parse round trip
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_date(date_format(DATE '1999-12-31', 'yyyy-MM-dd'), 'yyyy-MM-dd') = DATE '1999-12-31'
  AND weekofyear(DATE '2020-01-05') = 1
