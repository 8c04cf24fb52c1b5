statement
CREATE TABLE t_sall(v int) USING parquet

statement
CREATE TABLE t_sbll(v int) USING parquet

statement
INSERT INTO t_sall VALUES (1), (1), (2), (2), (2), (3)

statement
INSERT INTO t_sbll VALUES (1), (2), (2), (4)

query
SELECT v FROM t_sall INTERSECT ALL SELECT v FROM t_sbll ORDER BY v

query
SELECT v FROM t_sall EXCEPT ALL SELECT v FROM t_sbll ORDER BY v
