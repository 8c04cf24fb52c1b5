statement
CREATE TABLE t_cc(x double, y double) USING parquet

statement
INSERT INTO t_cc VALUES (1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2), (NULL, 1.0)

query tolerance=1e-9
SELECT corr(x, y) AS c, covar_samp(x, y) AS cs, covar_pop(x, y) AS cp FROM t_cc
