-- UNION shape rules: output column names come from the FIRST branch;
-- parenthesized branches keep their own ORDER BY/LIMIT; the outer
-- ORDER BY applies to the whole union.

statement
CREATE TABLE t_ush(k int, v string) USING parquet

statement
INSERT INTO t_ush VALUES (1, 'a'), (2, 'b'), (3, 'c')

query
SELECT a FROM (SELECT k AS a FROM t_ush UNION ALL SELECT k + 10 AS other_name FROM t_ush) u ORDER BY a

query
(SELECT k AS x FROM t_ush ORDER BY k LIMIT 1) UNION ALL (SELECT k AS x FROM t_ush ORDER BY k DESC LIMIT 1) ORDER BY x

query
SELECT k, v FROM t_ush UNION SELECT k, v FROM t_ush ORDER BY k

query
SELECT count(*) AS n FROM (SELECT v FROM t_ush UNION ALL SELECT v FROM t_ush) u
