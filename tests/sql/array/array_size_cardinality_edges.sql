-- size / cardinality / array_size null semantics (reference:
-- sql-tests/expressions/array/size.sql — its rows pivot on the
-- legacy sizeOfNull flag).  Under the session default
-- (spark.sql.legacy.sizeOfNull tracks ANSI), size(NULL) is NULL; the
-- historical -1 is pinned under the explicit legacy Config in
-- array_size_legacy.sql.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(array(1, 2)) = 2
  AND array_size(array(1, 2)) = 2
  AND cardinality(array()) = 0
  AND size(CAST(NULL AS ARRAY<INT>)) IS NULL
  AND cardinality(CAST(NULL AS ARRAY<INT>)) IS NULL
  AND array_size(CAST(NULL AS ARRAY<INT>)) IS NULL

-- NULL elements still count
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(array(NULL, NULL)) = 2 AND size(array(1, NULL)) = 2

-- size works on maps too (cardinality alias)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(map('a', 1, 'b', 2)) = 2
  AND cardinality(map()) = 0
