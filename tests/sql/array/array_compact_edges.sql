-- array_compact null-stripping matrix (reference:
-- sql-tests/expressions/array/array_compact.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_compact(array(1, NULL, 2, NULL)), ',') = '1,2'
  AND size(array_compact(array(NULL, NULL))) = 0
  AND size(array_compact(array())) = 0
  AND array_compact(CAST(NULL AS ARRAY<INT>)) IS NULL
  AND array_join(array_compact(array('a', NULL, '')), ',') = 'a,'

-- compact preserves order and duplicates of the non-null survivors
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_compact(array(2, NULL, 1, 2, NULL, 1)), ',') = '2,1,2,1'
