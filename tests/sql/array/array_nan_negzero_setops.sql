-- NaN and -0.0 equality inside array functions: Spark's collection
-- membership treats NaN == NaN and -0.0 == 0.0 (unlike raw IEEE
-- comparison), and set ops / distinct apply the same normalized
-- equality to nested arrays and structs
-- (reference: sql-tests/expressions/array/{array_contains,
-- array_distinct,array_union,array_except,array_intersect}.sql).

-- NaN is FINDABLE: membership equality, not IEEE <>
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(cast('NaN' as double)), cast('NaN' as double))
  AND array_position(array(1.0, cast('NaN' as double)), cast('NaN' as double)) = 2
  AND size(array_distinct(array(cast('NaN' as double), cast('NaN' as double)))) = 1

-- -0.0 and 0.0 are the same member
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(cast(0.0 as double)), cast(-0.0 as double))
  AND array_position(array(cast(-0.0 as double)), cast(0.0 as double)) = 1
  AND size(array_distinct(array(cast(0.0 as double), cast(-0.0 as double)))) = 1

-- set ops under normalized equality: NaN dedups across sides
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(array_union(array(cast('NaN' as double)), array(cast('NaN' as double)))) = 1
  AND array_except(array(cast('NaN' as double), 1.0), array(cast('NaN' as double))) = array(cast(1.0 as double))
  AND size(array_intersect(array(cast('NaN' as double)), array(cast('NaN' as double)))) = 1

-- nested arrays and structs compare structurally
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_intersect(array(array(1,2), array(3)), array(array(1,2))) = array(array(1,2))
  AND size(array_distinct(array(named_struct('a',1), named_struct('a',1), named_struct('a',2)))) = 2
  AND array_contains(array(array(1,2)), array(1,2))

-- NULL elements: membership with NULL probe is NULL, not false
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(1,2), cast(NULL as int)) IS NULL
  AND array_position(array(1, NULL), cast(NULL as int)) IS NULL
  AND size(array_distinct(array(NULL, NULL, 1))) = 2
