-- IN / NOT IN against an EMPTY subquery: FALSE / TRUE even for NULL
-- probe values (the empty set short-circuits three-valued logic —
-- contrast with in_list_nulls.sql where a NULL in a NON-empty list
-- poisons NOT IN).  Plus COUNT(ALL) and embedded NUL bytes.

statement
CREATE TABLE t_ies(x int) USING parquet

statement
INSERT INTO t_ies VALUES (1), (NULL)

query
SELECT x, x IN (SELECT 99 WHERE false) AS in_empty, x NOT IN (SELECT 99 WHERE false) AS notin_empty FROM t_ies ORDER BY x NULLS FIRST

query
SELECT x FROM t_ies WHERE x NOT IN (SELECT 99 WHERE false) ORDER BY x NULLS FIRST

query
SELECT count(ALL x) AS count_all, count(x) AS count_plain, sum(1) AS const_sum FROM t_ies

query
SELECT length('a' || chr(0) || 'b') AS nul_len, instr('a' || chr(0) || 'b', 'b') AS nul_find, chr(0) = '' AS nul_not_empty
