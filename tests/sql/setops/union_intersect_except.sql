statement
CREATE TABLE t_sa(v int) USING parquet

statement
CREATE TABLE t_sb(v int) USING parquet

statement
INSERT INTO t_sa VALUES (1), (2), (2), (3), (NULL)

statement
INSERT INTO t_sb VALUES (2), (3), (4), (NULL)

query
SELECT v FROM t_sa UNION SELECT v FROM t_sb ORDER BY v NULLS FIRST

query
SELECT v FROM t_sa UNION ALL SELECT v FROM t_sb ORDER BY v NULLS FIRST

query
SELECT v FROM t_sa INTERSECT SELECT v FROM t_sb ORDER BY v NULLS FIRST

query
SELECT v FROM t_sa EXCEPT SELECT v FROM t_sb ORDER BY v NULLS FIRST
