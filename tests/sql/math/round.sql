statement
CREATE TABLE t_round(d double) USING parquet

statement
INSERT INTO t_round VALUES (2.45), (-2.45), (2.55), (1.005), (NULL)

query tolerance=1e-9
SELECT round(d, 1) AS r1, round(d) AS r0 FROM t_round ORDER BY d NULLS FIRST
