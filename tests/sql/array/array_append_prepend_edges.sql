-- array_append / array_prepend null-position matrix (reference:
-- sql-tests/expressions/array/array_append.sql).  DuckDB's
-- list_append family differs in name and null semantics — Spark-only
-- pins (array outputs serialized through array_join, the corpus
-- convention for driver-hash-safe collections).

-- appending/prepending a NULL element KEEPS it; appending to a NULL
-- array yields NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_append(array(1, 2), 3), ',') = '1,2,3'
  AND array_join(array_append(array(1, 2), NULL), ',', 'N') = '1,2,N'
  AND array_append(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND array_join(array_prepend(array(2, 3), 1), ',') = '1,2,3'
  AND array_join(array_prepend(array(1), NULL), ',', 'N') = 'N,1'
  AND array_prepend(CAST(NULL AS ARRAY<INT>), 1) IS NULL

-- appending to an empty array; element type widening (int into a
-- double array)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_append(array(), 'x'), ',') = 'x'
  AND array_join(array_append(array(CAST(1.5 AS DOUBLE)), 2), ',') = '1.5,2.0'
  AND size(array_append(array(), NULL)) = 1
