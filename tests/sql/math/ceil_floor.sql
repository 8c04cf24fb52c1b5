statement
CREATE TABLE t_cf(d double) USING parquet

statement
INSERT INTO t_cf VALUES (1.5), (-1.5), (2.0), (-0.1), (NULL)

query
SELECT ceil(d) AS c, floor(d) AS f FROM t_cf ORDER BY d NULLS FIRST
