-- array_remove matrix (reference:
-- sql-tests/expressions/array/array_remove.sql): removes ALL
-- occurrences, never removes NULL elements (NULL = x is unknown), and
-- a NULL needle poisons the result.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_remove(array(1, 2, 1, 3), 1), ',') = '2,3'
  AND array_join(array_remove(array(1, NULL, 1), 1), ',', 'N') = 'N'
  AND array_remove(array(1, 2), NULL) IS NULL
  AND array_remove(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND size(array_remove(array(), 1)) = 0
  AND array_join(array_remove(array('a', 'b', 'a'), 'a'), ',') = 'b'

-- needle type coercion: removing DOUBLE 2.0 from an int array works
-- through the widened comparison
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_remove(array(1, 2, 3), CAST(2.0 AS DOUBLE)), ',')
      = '1.0,3.0'
