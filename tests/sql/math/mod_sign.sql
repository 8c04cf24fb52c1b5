statement
CREATE TABLE t_mod(a int, b int) USING parquet

statement
INSERT INTO t_mod VALUES (7, 3), (-7, 3), (7, -3), (0, 5)

query tolerance=1e-12
SELECT a % b AS m, mod(a, b) AS mf, sign(a) AS sg FROM t_mod ORDER BY a, b
