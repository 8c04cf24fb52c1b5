-- rlike / RLIKE operator / regexp_like alias (reference:
-- sql-tests/expressions/string/rlike.sql, rlike_enabled.sql).
-- Java-regex semantics are Spark-only (DuckDB has no RLIKE operator
-- and its regexp dialect differs at the edges).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE rlike('abc123', '[a-z]+\\d+')
  AND 'abc' RLIKE '^a'
  AND NOT regexp_like('xy', 'z')
  AND rlike(NULL, 'a') IS NULL
  AND rlike('a', NULL) IS NULL

-- unanchored contains-semantics (LIKE is anchored, RLIKE is not)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE rlike('xxabcxx', 'abc')
  AND NOT ('xxabcxx' LIKE 'abc')
  AND ('xxabcxx' LIKE '%abc%')

-- java regex classes: \\s \\b \\w, case-insensitive (?i) inline flag
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE rlike('a b', 'a\\sb')
  AND rlike('word', '\\bword\\b')
  AND rlike('ABC', '(?i)abc')
  AND NOT rlike('ABC', 'abc')
