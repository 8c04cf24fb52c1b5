statement
CREATE TABLE t_cw(a string, b string, c string) USING parquet

statement
INSERT INTO t_cw VALUES ('x', 'y', 'z'), ('p', NULL, 'q'), (NULL, NULL, NULL)

query
SELECT concat_ws('-', a, b, c) AS joined FROM t_cw ORDER BY a NULLS FIRST
