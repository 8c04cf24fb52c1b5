statement
CREATE TABLE t_hd(grp string, v int) USING parquet

statement
INSERT INTO t_hd VALUES ('a', 1), ('a', 1), ('a', 2), ('b', 5), ('c', 9)

query
SELECT grp, count(DISTINCT v) AS dv FROM t_hd GROUP BY grp HAVING count(*) > 1 ORDER BY grp

query
SELECT DISTINCT grp FROM t_hd ORDER BY grp
