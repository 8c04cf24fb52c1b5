-- array_repeat count matrix (reference:
-- sql-tests/expressions/array/array_repeat.sql): zero and negative
-- counts yield EMPTY (no error, either eval mode); a NULL element is
-- repeatable; a NULL count poisons.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_repeat('x', 3), ',') = 'x,x,x'
  AND size(array_repeat(1, 0)) = 0
  AND size(array_repeat(1, -2)) = 0
  AND array_join(array_repeat(NULL, 2), ',', 'N') = 'N,N'
  AND array_repeat(1, CAST(NULL AS INT)) IS NULL
  AND size(array_repeat(array(1, 2), 2)) = 2
