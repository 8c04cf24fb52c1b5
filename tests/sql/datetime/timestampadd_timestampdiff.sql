-- timestampadd/timestampdiff unit arithmetic, including the
-- ASYMMETRY at month ends: timestampadd(MONTH, 1, Jan 31) clamps to
-- Feb 29 (leap year), but timestampdiff(MONTH, Jan 31, Feb 29) = 0 —
-- a month only completes when the same day-of-month is reached, and
-- Feb has no 31st (reference: sql-tests/expressions/datetime/
-- date_add.sql / date_diff.sql unit families).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestampadd(DAY, 3, timestamp'2024-01-01 00:00:00') = timestamp'2024-01-04 00:00:00'
  AND timestampadd(HOUR, -12, timestamp'2024-01-01 12:00:00') = timestamp'2024-01-01 00:00:00'
  AND timestampadd(MINUTE, 90, timestamp'2024-01-01 00:00:00') = timestamp'2024-01-01 01:30:00'
  AND timestampadd(SECOND, 61, timestamp'2024-01-01 00:00:00') = timestamp'2024-01-01 00:01:01'

-- month-end clamping on ADD
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestampadd(MONTH, 1, timestamp'2024-01-31 00:00:00') = timestamp'2024-02-29 00:00:00'
  AND timestampadd(QUARTER, 1, timestamp'2024-01-31 00:00:00') = timestamp'2024-04-30 00:00:00'
  AND timestampadd(YEAR, 1, timestamp'2024-02-29 00:00:00') = timestamp'2025-02-28 00:00:00'

-- DIFF counts COMPLETED units (and can be negative)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestampdiff(DAY, timestamp'2024-01-01 00:00:00', timestamp'2024-01-04 12:00:00') = 3
  AND timestampdiff(HOUR, timestamp'2024-01-01 12:00:00', timestamp'2024-01-01 00:00:00') = -12
  AND timestampdiff(MONTH, timestamp'2024-01-31 00:00:00', timestamp'2024-02-29 00:00:00') = 0
  AND timestampdiff(MONTH, timestamp'2024-01-31 00:00:00', timestamp'2024-03-31 00:00:00') = 2
  AND timestampdiff(YEAR, timestamp'2024-02-29 00:00:00', timestamp'2025-02-28 00:00:00') = 0

-- add-then-diff is NOT an identity at clamped month ends
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestampdiff(MONTH,
        timestamp'2024-01-31 00:00:00',
        timestampadd(MONTH, 1, timestamp'2024-01-31 00:00:00')) = 0

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE timestampadd(DAY, cast(NULL as int), timestamp'2024-01-01 00:00:00') IS NULL
  AND timestampdiff(DAY, cast(NULL as timestamp), timestamp'2024-01-01 00:00:00') IS NULL
