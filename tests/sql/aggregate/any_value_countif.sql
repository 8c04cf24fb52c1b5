statement
CREATE TABLE t_av(grp string, v int) USING parquet

statement
INSERT INTO t_av VALUES ('a', 7), ('a', 7), ('b', 1), ('b', 2)

query
SELECT grp, any_value(v) AS av FROM t_av WHERE v = 7 GROUP BY grp ORDER BY grp

query
SELECT count(*) FILTER (WHERE v > 1) AS big, count(*) FILTER (WHERE v = 1) AS one FROM t_av
