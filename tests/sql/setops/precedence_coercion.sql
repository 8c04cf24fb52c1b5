-- Set-operation precedence (INTERSECT binds tighter than UNION/EXCEPT
-- in both engines — ANSI precedence) and type coercion across set-op
-- branches; NULL-only unions dedupe to one row.

query
SELECT 1 AS x UNION SELECT 2 INTERSECT SELECT 2 ORDER BY 1

query
SELECT 3 AS x EXCEPT SELECT 2 UNION SELECT 2 ORDER BY 1

query
SELECT 1 INTERSECT SELECT 1.0 ORDER BY 1

query
SELECT NULL AS n UNION SELECT NULL

query
SELECT x FROM ((SELECT 1 AS x UNION SELECT 2) INTERSECT SELECT 2) t ORDER BY x

-- UNION branch coercion DIRECTION (round 8): with INT vs STRING
-- branches Spark picks the NUMERIC side (string values cast to
-- BIGINT — a non-numeric string then RAISES under ANSI, a
-- data-dependent failure), and with DATE vs STRING picks DATE;
-- DuckDB picks VARCHAR in both cases and never fails.  BOOLEAN vs
-- INT doesn't coerce at all in Spark (INCOMPATIBLE_COLUMN_TYPE)
-- where DuckDB widens.  Silent (type + value) divergence —
-- COMPAT.md setops rows.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE (SELECT typeof(v) FROM (SELECT 1 AS v UNION ALL SELECT '2') u LIMIT 1) = 'bigint'
  AND (SELECT sum(v) FROM (SELECT 1 AS v UNION ALL SELECT '2') u) = 3
  AND (SELECT min(v) FROM (SELECT date'2026-01-01' AS v UNION ALL SELECT '2026-02-03') u) = date'2026-01-01'

query expect_error=CAST_INVALID_INPUT
SELECT v FROM (SELECT 1 AS v UNION ALL SELECT 'a') t

query expect_error=INCOMPATIBLE_COLUMN_TYPE
SELECT v FROM (SELECT true AS v UNION ALL SELECT 0) t
