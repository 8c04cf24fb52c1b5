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
