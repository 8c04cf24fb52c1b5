-- The nine ANSI linear-regression aggregates (regr_*), identical
-- definitions in Spark and DuckDB.  NULL pairs are excluded by both.

statement
CREATE TABLE t_rg(x double, y double) USING parquet

statement
INSERT INTO t_rg VALUES (1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 8.0), (5.0, 9.8), (NULL, 1.0), (6.0, NULL)

query tolerance=1e-9
SELECT regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept, regr_r2(y, x) AS r2 FROM t_rg

query
SELECT regr_count(y, x) AS n FROM t_rg

query tolerance=1e-9
SELECT regr_avgx(y, x) AS ax, regr_avgy(y, x) AS ay FROM t_rg

query tolerance=1e-9
SELECT regr_sxx(y, x) AS sxx, regr_syy(y, x) AS syy, regr_sxy(y, x) AS sxy FROM t_rg
