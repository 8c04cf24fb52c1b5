-- NULL inside an IN value list: x IN (1, NULL) is TRUE or UNKNOWN
-- (never FALSE); x NOT IN (1, NULL) is FALSE or UNKNOWN (never TRUE)
-- — the three-valued-logic trap that silently empties NOT IN queries.

statement
CREATE TABLE t_inn(x int) USING parquet

statement
INSERT INTO t_inn VALUES (1), (2), (NULL)

query
SELECT x, x IN (1, NULL) AS in_with_null, x NOT IN (1, NULL) AS not_in_with_null FROM t_inn ORDER BY x NULLS FIRST

-- WHERE filters UNKNOWN: only the literal match survives
query
SELECT x FROM t_inn WHERE x IN (1, NULL) ORDER BY x

-- and NOT IN with a NULL in the list selects NOTHING
query
SELECT x FROM t_inn WHERE x NOT IN (1, NULL) ORDER BY x

query
SELECT x, x IN (1, 2) AS plain_in, x NOT IN (9) AS plain_not_in FROM t_inn ORDER BY x NULLS FIRST
