statement
CREATE TABLE t_sv(x double, grp string) USING parquet

statement
INSERT INTO t_sv VALUES (1.0, 'a'), (2.0, 'a'), (3.0, 'a'), (10.0, 'b'), (NULL, 'b')

query tolerance=1e-9
SELECT stddev_samp(x) AS ss, stddev_pop(x) AS sp, var_samp(x) AS vs, var_pop(x) AS vp FROM t_sv

query tolerance=1e-9
SELECT grp, var_pop(x) AS vp FROM t_sv GROUP BY grp ORDER BY grp
