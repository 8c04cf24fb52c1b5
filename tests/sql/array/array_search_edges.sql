-- array_position / array_contains / array_remove edge matrix
-- (reference: .../expressions/array/array_position.sql,
-- array_contains.sql, array_remove.sql).  The sharp edges: a NULL
-- search value returns NULL (never 0/false), a miss over an array
-- that CONTAINS nulls is NULL (three-valued logic), and array_remove
-- keeps the nulls it cannot compare.

-- array_position: 1-based; 0 = not found; first occurrence wins
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_position(array('a', 'b', 'b'), 'b') = 2
  AND array_position(array('a', 'b'), 'z') = 0
  AND array_position(array(), 1) = 0
  AND array_position(array(1, NULL, 1), 1) = 1

-- array_position NULL propagation: null value or null array -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_position(array(1, 2), CAST(NULL AS INT)) IS NULL
  AND array_position(CAST(NULL AS ARRAY<INT>), 1) IS NULL

-- array_contains three-valued logic: hit -> true; miss over a
-- null-free array -> false; miss over an array WITH nulls -> NULL
-- (the null might have been the match)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array(1, 2, 3), 2) = true
  AND array_contains(array(1, 2, 3), 9) = false
  AND array_contains(array(1, NULL, 3), 9) IS NULL
  AND array_contains(array(1, NULL, 3), 1) = true
  AND array_contains(array(), 1) = false
  AND array_contains(array(1, 2), CAST(NULL AS INT)) IS NULL
  AND array_contains(CAST(NULL AS ARRAY<INT>), 1) IS NULL

-- array_remove: removes ALL occurrences, keeps nulls (incomparable),
-- NULL value or NULL array -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_remove(array(1, 2, 1, 3, 1), 1), ',') = '2,3'
  AND array_join(array_remove(array(1, NULL, 1, 2), 1), ',', 'N') = 'N,2'
  AND array_join(array_remove(array('a', '', 'a'), 'a'), '|') = ''
  AND array_remove(array(1, 2), CAST(NULL AS INT)) IS NULL
  AND array_remove(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND size(array_remove(array(), 1)) = 0

-- string edges: empty string is a real, findable value distinct from
-- NULL; multibyte values compare whole-codepoint
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_position(array('x', '', 'y'), '') = 2
  AND array_contains(array('中文', 'abc'), '中文') = true
  AND array_contains(array('中文'), '中') = false
