statement
CREATE TABLE t_trig(x double) USING parquet

statement
INSERT INTO t_trig VALUES (0.0), (0.5), (1.0), (-1.0)

query tolerance=1e-12
SELECT sin(x) AS s, cos(x) AS c, atan(x) AS a FROM t_trig ORDER BY x
