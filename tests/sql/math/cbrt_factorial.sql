statement
CREATE TABLE t_cb(x double, n int) USING parquet

statement
INSERT INTO t_cb VALUES (8.0, 0), (27.0, 3), (-8.0, 5), (1000.0, 10)

query tolerance=1e-12
SELECT cbrt(x) AS c, factorial(n) AS f FROM t_cb ORDER BY x
