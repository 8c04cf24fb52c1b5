statement
CREATE TABLE t_lo(v int) USING parquet

statement
INSERT INTO t_lo VALUES (1), (2), (3), (4), (5), (6), (7), (8)

query
SELECT v FROM t_lo ORDER BY v LIMIT 3

query
SELECT v FROM t_lo ORDER BY v LIMIT 3 OFFSET 4
