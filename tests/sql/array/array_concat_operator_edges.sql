-- concat() over arrays and the || operator (reference:
-- sql-tests/expressions/array/array_concat.sql).  concat of arrays is
-- NULL-poisoned by a NULL argument (unlike string concat in some
-- dialects), keeps duplicates, and widens element types.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(concat(array(1, 2), array(3), array(2)), ',') = '1,2,3,2'
  AND array_join(array(1) || array(2), ',') = '1,2'
  AND concat(array(1), CAST(NULL AS ARRAY<INT>)) IS NULL
  AND (array(1) || CAST(NULL AS ARRAY<INT>)) IS NULL
  AND size(concat(array(), array())) = 0

-- NULL ELEMENTS survive concat (only a NULL ARRAY poisons)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(concat(array(1, NULL), array(NULL, 2)), ',', 'N') = '1,N,N,2'

-- element type widening across sides: int ++ double -> double
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(concat(array(1), array(CAST(2.5 AS DOUBLE))), ',') = '1.0,2.5'
