-- next_day(date, dayOfWeek): accepts full names, 3-letter and
-- 2-letter abbreviations case-insensitively, NEVER returns the input
-- date itself (same-day name -> one week later), raises on an
-- unknown name under ANSI, and NULL name -> NULL
-- (reference: sql-tests/expressions/datetime/next_day.sql).
-- 2024-01-01 is a Monday.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE next_day(date'2024-01-01', 'Monday') = date'2024-01-08'
  AND next_day(date'2024-01-01', 'mon') = date'2024-01-08'
  AND next_day(date'2024-01-01', 'MO') = date'2024-01-08'
  AND next_day(date'2024-01-01', 'TUESDAY') = date'2024-01-02'
  AND next_day(date'2024-01-01', 'sunday') = date'2024-01-07'

-- crossing a month and a year boundary
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE next_day(date'2024-01-31', 'Friday') = date'2024-02-02'
  AND next_day(date'2023-12-31', 'monday') = date'2024-01-01'

-- NULL inputs propagate (even under ANSI)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE next_day(date'2024-01-01', NULL) IS NULL
  AND next_day(cast(NULL as date), 'Monday') IS NULL

query expect_error=ILLEGAL_DAY_OF_WEEK
SELECT next_day(date'2024-01-01', 'Noday')
