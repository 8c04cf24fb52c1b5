statement
CREATE TABLE t_decr(a decimal(12,4)) USING parquet

statement
INSERT INTO t_decr VALUES (2.4567), (-2.4567), (2.5000), (NULL)

query
SELECT round(a, 2) AS r2, floor(a) AS f, ceil(a) AS c, abs(a) AS ab FROM t_decr ORDER BY a NULLS FIRST
