statement
CREATE TABLE t_wrn(grp string, v int) USING parquet

statement
INSERT INTO t_wrn VALUES ('a', 10), ('a', 20), ('a', 20), ('b', 5), ('b', NULL)

query
SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v NULLS FIRST) AS rn, rank() OVER (PARTITION BY grp ORDER BY v NULLS FIRST) AS rk, dense_rank() OVER (PARTITION BY grp ORDER BY v NULLS FIRST) AS dr FROM t_wrn ORDER BY grp, rn
