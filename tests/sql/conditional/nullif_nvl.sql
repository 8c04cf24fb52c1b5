statement
CREATE TABLE t_ni(a int, b int) USING parquet

statement
INSERT INTO t_ni VALUES (1, 1), (1, 2), (NULL, 3)

query
SELECT nullif(a, b) AS n, ifnull(a, b) AS i FROM t_ni ORDER BY a NULLS FIRST, b
