statement
CREATE TABLE t_gl(a int, b int, c int) USING parquet

statement
INSERT INTO t_gl VALUES (1, 5, 3), (-1, -5, -3), (7, 7, 7)

query
SELECT greatest(a, b, c) AS g, least(a, b, c) AS l FROM t_gl ORDER BY a
