-- array_sort vs sort_array null placement — the classic divergence:
-- array_sort puts NULLs LAST regardless; sort_array asc puts them
-- FIRST, desc puts them LAST.  Custom comparator lambdas control
-- everything except null placement
-- (reference: sql-tests/expressions/array/sort_array.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_sort(array(2, NULL, 1)) = array(1, 2, NULL)
  AND sort_array(array(2, NULL, 1)) = array(NULL, 1, 2)
  AND sort_array(array(2, NULL, 1), true) = array(NULL, 1, 2)
  AND sort_array(array(2, NULL, 1), false) = array(2, 1, NULL)

-- comparator lambda: descending via inverted sign convention
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_sort(array(2, 1, 3),
        (l, r) -> CASE WHEN l < r THEN 1 WHEN l > r THEN -1 ELSE 0 END)
      = array(3, 2, 1)

-- case-insensitive comparator: ties keep a deterministic total order
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_sort(array('b', 'A', 'c'),
        (l, r) -> CASE WHEN lower(l) < lower(r) THEN -1
                       WHEN lower(l) > lower(r) THEN 1 ELSE 0 END)
      = array('A', 'b', 'c')

-- strings sort by codepoint by default: uppercase before lowercase
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_sort(array('b', 'A', 'c')) = array('A', 'b', 'c')
  AND sort_array(array('b', 'a', 'B')) = array('B', 'a', 'b')

-- empty and NULL arrays pass through
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_sort(array()) = array()
  AND array_sort(cast(NULL as array<int>)) IS NULL
