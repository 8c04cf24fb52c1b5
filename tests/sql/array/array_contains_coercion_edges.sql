-- array_contains three-valued logic + needle type coercion
-- (reference: sql-tests/expressions/array/array_contains.sql — half
-- its rows are implicit-cast pairs).

-- 3VL: found -> true; not found with a NULL element -> NULL (the
-- NULL might have been it); not found, null-free -> false
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(1, 2), 2) = true
  AND array_contains(array(1, 2), 3) = false
  AND array_contains(array(1, NULL), 3) IS NULL
  AND array_contains(array(1, NULL), 1) = true
  AND array_contains(array(), 1) = false
  AND array_contains(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND array_contains(array(1, 2), CAST(NULL AS INT)) IS NULL
  -- (an untyped NULL needle is an ANALYSIS error, DATATYPE_MISMATCH.NULL_TYPE)

-- needle/element implicit widening: int array vs double needle,
-- string array vs date-ish string stays string
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(1, 2), CAST(2.0 AS DOUBLE)) = true
  AND array_contains(array(CAST(1 AS BIGINT)), 1) = true
  AND array_contains(array(1.5), CAST(1.5 AS DOUBLE)) = true
  AND array_contains(array('1'), '1') = true
