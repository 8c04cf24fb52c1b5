-- array_min / array_max ordering matrix (reference:
-- sql-tests/expressions/array/array_min.sql, array_max.sql): NULL
-- elements are SKIPPED (not poisoning), the all-null and empty arrays
-- yield NULL, and in Spark's total order NaN sorts ABOVE +Infinity —
-- so array_max picks NaN over Inf while array_min picks the finite
-- value.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_min(array(3, 1, NULL)) = 1
  AND array_max(array(3, 1, NULL)) = 3
  AND array_min(array(CAST(NULL AS INT))) IS NULL
  AND array_min(CAST(array() AS ARRAY<INT>)) IS NULL
  AND array_max(CAST(NULL AS ARRAY<INT>)) IS NULL

-- NaN is the maximum of Spark's double total order
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_min(array(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE), 1.0)) = 1.0
  AND isnan(array_max(array(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE))))
  AND array_max(array(CAST('-Infinity' AS DOUBLE), -1.0)) = -1.0
  AND array_min(array(CAST('-Infinity' AS DOUBLE), -1.0)) = CAST('-Infinity' AS DOUBLE)

-- strings order lexicographically; '' is smaller than everything
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_min(array('b', 'a', '')) = ''
  AND array_max(array('b', 'a', 'ab')) = 'b'
