-- sequence(start, stop[, step]): auto-steps descend when stop<start,
-- zero / wrong-sign steps RAISE, and date sequences with month
-- intervals clamp to month ends (leap-year Feb 29)
-- (reference: sql-tests/expressions/array sequence coverage;
-- Spark-only surface — DuckDB's generate_series differs in name and
-- inclusivity rules).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sequence(1, 5) = array(1,2,3,4,5)
  AND sequence(5, 1) = array(5,4,3,2,1)
  AND sequence(3, 3) = array(3)
  AND sequence(1, 10, 3) = array(1,4,7,10)
  AND sequence(10, 1, -4) = array(10,6,2)

-- stop is inclusive only when the step lands on it exactly
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sequence(1, 9, 3) = array(1,4,7)
  AND size(sequence(1, 2, 3)) = 1

-- date sequences: month stepping from Jan 31 clamps into Feb 29
-- (2024 is a leap year) and back out to Mar 31
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sequence(date'2024-01-01', date'2024-01-04', interval 1 day)
        = array(date'2024-01-01', date'2024-01-02', date'2024-01-03', date'2024-01-04')
  AND sequence(date'2024-01-31', date'2024-03-31', interval 1 month)
        = array(date'2024-01-31', date'2024-02-29', date'2024-03-31')

-- NULL bounds -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sequence(cast(NULL as int), 5) IS NULL
  AND sequence(1, cast(NULL as int)) IS NULL

query expect_error=Illegal sequence boundaries
SELECT sequence(1, 5, 0)

query expect_error=Illegal sequence boundaries
SELECT sequence(1, 5, -1)

query expect_error=Illegal sequence boundaries
SELECT sequence(5, 1, 1)
