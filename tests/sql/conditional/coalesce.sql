statement
CREATE TABLE t_coal(a int, b int, c int) USING parquet

statement
INSERT INTO t_coal VALUES (NULL, NULL, 3), (NULL, 2, 3), (1, 2, 3), (NULL, NULL, NULL)

query
SELECT coalesce(a, b, c) AS f, coalesce(a, 0) AS a0 FROM t_coal ORDER BY a NULLS FIRST, b NULLS FIRST, c NULLS FIRST
