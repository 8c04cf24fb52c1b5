-- Row-value (tuple) comparisons and IN-lists — shared, lexicographic.
-- LIKE escape semantics: an explicit ESCAPE clause is shared, but the
-- DEFAULT escape diverges (documented): Spark treats backslash as the
-- escape with no clause; DuckDB has NO default escape, so 'a\_c'
-- matches a literal backslash there.  ILIKE / SIMILAR TO / quantified
-- ANY/ALL are DuckDB-only grammar (COMPAT.md).

query
SELECT (1, 2) = (1, 2) AS row_eq, (1, 2) < (1, 3) AS lt_last, (2, 1) < (1, 9) AS first_decides

query
SELECT x FROM (VALUES (1), (2), (3)) t(x) WHERE (x, 'a') IN ((1, 'a'), (3, 'b')) ORDER BY x

query
SELECT 'a%b' LIKE 'a|%b' ESCAPE '|' AS pct_literal, 'aXb' LIKE 'a|%b' ESCAPE '|' AS pct_not_wild

query
SELECT 'a_c' LIKE 'a!_c' ESCAPE '!' AS underscore_literal, 'axc' LIKE 'a!_c' ESCAPE '!' AS not_wildcard

-- default escape divergence: Spark's implicit backslash
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE 'a_c' LIKE 'a\\_c' AND NOT ('axc' LIKE 'a\\_c')
