-- flatten null-position matrix (reference:
-- sql-tests/expressions/array/flatten.sql): a NULL INNER array
-- poisons the whole flatten (the result would have undefined length),
-- while NULL leaf ELEMENTS survive.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(flatten(array(array(1, 2), array(3))), ',') = '1,2,3'
  AND flatten(array(array(1), CAST(NULL AS ARRAY<INT>))) IS NULL
  AND flatten(CAST(NULL AS ARRAY<ARRAY<INT>>)) IS NULL
  AND array_join(flatten(array(array(1, NULL), array(NULL))), ',', 'N')
      = '1,N,N'
  AND size(flatten(array(array(), array()))) = 0

-- flatten is one-level only: array<array<array<int>>> flattens to
-- array<array<int>>
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(flatten(array(array(array(1), array(2)), array(array(3))))) = 3
