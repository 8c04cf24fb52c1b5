-- Aggregates over EMPTY input (global agg emits one NULL/zero row;
-- grouped agg emits nothing) and single-row degenerate statistics
-- (sample variance of one point is NULL, population variance is 0).

statement
CREATE TABLE t_emp(x int) USING parquet

statement
INSERT INTO t_emp VALUES (1), (2), (3)

query
SELECT sum(x) AS s, count(x) AS c, count(*) AS cs, avg(x) AS a, min(x) AS mn, max(x) AS mx FROM t_emp WHERE x > 99

query
SELECT x, count(*) AS c FROM t_emp WHERE x > 99 GROUP BY x

query
SELECT stddev(x) AS sd, var_samp(x) AS vs, var_pop(x) AS vp FROM t_emp WHERE x = 2

query
SELECT corr(x, x) AS c FROM t_emp WHERE x = 2

query
SELECT sum(DISTINCT x) AS sd, count(DISTINCT x) AS cd FROM t_emp WHERE x > 99
