-- Array function surface, mirroring the reference corpus class
-- (reference: spark/src/test/resources/sql-tests/expressions/array/ —
-- 28 per-function files).  Spark array grammar isn't shared with
-- DuckDB, so blocks are value-pinned spark_only.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_join(array_append(array(1, 2), 3), ',') = '1,2,3'
  AND array_join(array_compact(array(1, NULL, 2, NULL)), ',') = '1,2'
  AND array_join(array_union(array(1, 2), array(2, 3)), ',') = '1,2,3'
  AND array_join(array_intersect(array(1, 2, 3), array(2, 3, 4)), ',') = '2,3'
  AND array_join(array_except(array(1, 2, 3), array(2)), ',') = '1,3'

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_contains(array(1, 2, 3), 2) = true
  AND array_position(array('a', 'b', 'c'), 'b') = 2
  AND array_position(array('a'), 'z') = 0
  AND array_max(array(3, 1, 2)) = 3
  AND array_min(array(3, 1, 2)) = 1
  AND size(array(1, 2, 3)) = 3
  AND size(array()) = 0

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_join(array_remove(array(1, 2, 1, 3), 1), ',') = '2,3'
  AND array_join(array_repeat('x', 3), ',') = 'x,x,x'
  AND array_join(array_insert(array(1, 2, 4), 3, 3), ',') = '1,2,3,4'
  AND arrays_overlap(array(1, 2), array(2, 9)) = true
  AND arrays_overlap(array(1, 2), array(8, 9)) = false

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_join(sort_array(array(3, 1, 2)), ',') = '1,2,3'
  AND array_join(sort_array(array(3, 1, 2), false), ',') = '3,2,1'
  AND array_join(flatten(array(array(1), array(2, 3))), ',') = '1,2,3'
  AND element_at(array(10, 20, 30), 2) = 20
  AND element_at(array(10, 20, 30), -1) = 30
  AND array(1, 2, 3)[1] = 2

-- arrays_zip produces structs; verify through to_json rendering
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_json(arrays_zip(array(1, 2), array('a', 'b'))) = '[{"0":1,"1":"a"},{"0":2,"1":"b"}]'

-- NULL-input propagation; under ANSI an out-of-bounds element_at
-- RAISES, so the tolerant access is try_element_at
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_contains(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND size(CAST(NULL AS ARRAY<INT>)) IS NULL
  AND try_element_at(array(1, 2), 5) IS NULL
