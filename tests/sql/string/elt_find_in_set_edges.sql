-- elt / find_in_set (reference: the reference's stringfuncs serde,
-- native/spark-expr/src/string_funcs/; sql-tests/expressions/string/
-- string.sql carries the elt rows).  elt is 1-based and under ANSI an
-- out-of-range index RAISES (INVALID_ARRAY_INDEX); find_in_set
-- returns 0 for no-match and for needles containing a comma.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE elt(2, 'a', 'b', 'c') = 'b'
  AND elt(1, 'only') = 'only'
  AND elt(CAST(NULL AS INT), 'a') IS NULL

-- ANSI: index 0 raises (1-based)
query expect_error=INVALID_ARRAY_INDEX
SELECT elt(0, 'a')

-- ANSI: index past the argument count raises
query expect_error=INVALID_ARRAY_INDEX
SELECT elt(4, 'a', 'b')

-- legacy mode tolerates out-of-range with NULL — pinned separately in
-- elt_legacy_null.sql

-- find_in_set: 1-based position, 0 on no-match, comma-in-needle -> 0,
-- empty needle matches an empty slot
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE find_in_set('b', 'a,b,c') = 2
  AND find_in_set('d', 'a,b,c') = 0
  AND find_in_set('a,b', 'a,b,c') = 0
  AND find_in_set('', 'a,,c') = 2
  AND find_in_set('', '') = 1
  AND find_in_set(NULL, 'a') IS NULL
