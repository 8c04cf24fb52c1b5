-- width_bucket(v, min, max, n) equi-width histogram bucketing:
-- underflow bucket 0, overflow bucket n+1, value==max lands in the
-- OVERFLOW bucket (half-open intervals), min>max flips direction, and
-- invalid bucket counts / NaN return NULL rather than raising
-- (Spark-only surface — DuckDB has no width_bucket).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE width_bucket(5.0, 0.0, 10.0, 5) = 3
  AND width_bucket(0.0, 0.0, 10.0, 5) = 1
  AND width_bucket(1.9999, 0.0, 10.0, 5) = 1
  AND width_bucket(2.0, 0.0, 10.0, 5) = 2

-- under/overflow buckets; max is EXCLUSIVE so v==max -> n+1
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE width_bucket(-1.0, 0.0, 10.0, 5) = 0
  AND width_bucket(11.0, 0.0, 10.0, 5) = 6
  AND width_bucket(10.0, 0.0, 10.0, 5) = 6

-- descending range (min > max) counts buckets downward
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE width_bucket(5.0, 10.0, 0.0, 5) = 3
  AND width_bucket(10.0, 10.0, 0.0, 5) = 1
  AND width_bucket(0.0, 10.0, 0.0, 5) = 6

-- invalid bucket count and NaN -> NULL (no raise, either eval mode)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE width_bucket(5.0, 0.0, 10.0, 0) IS NULL
  AND width_bucket(5.0, 0.0, 10.0, -3) IS NULL
  AND width_bucket(cast('NaN' as double), 0.0, 10.0, 5) IS NULL
  AND width_bucket(cast(NULL as double), 0.0, 10.0, 5) IS NULL
