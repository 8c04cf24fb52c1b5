-- percentile_cont / percentile_disc / mode() WITHIN GROUP — the ANSI
-- ordered-set aggregates both engines support.

statement
CREATE TABLE t_pwg(g string, x double) USING parquet

statement
INSERT INTO t_pwg VALUES ('a', 1.0), ('a', 2.0), ('a', 3.0), ('a', 10.0), ('b', 5.0), ('b', 5.0), ('b', 7.0), ('b', NULL)

query
SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS med, percentile_cont(0.25) WITHIN GROUP (ORDER BY x) AS q1 FROM t_pwg

query
SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS med_disc FROM t_pwg GROUP BY g ORDER BY g

query
SELECT g, mode() WITHIN GROUP (ORDER BY x) AS m FROM t_pwg GROUP BY g ORDER BY g
