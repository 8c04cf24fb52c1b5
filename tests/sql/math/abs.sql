statement
CREATE TABLE t_abs(i int, d double) USING parquet

statement
INSERT INTO t_abs VALUES (-5, -1.5), (0, -0.0), (7, 2.5), (NULL, NULL)

query
SELECT abs(i) AS ai, abs(d) AS ad FROM t_abs ORDER BY i NULLS FIRST
