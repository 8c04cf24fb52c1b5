statement
CREATE TABLE t_qo(grp string, v int) USING parquet

statement
INSERT INTO t_qo VALUES ('a', 1), ('a', 5), ('b', 2), ('b', 8)

query
SELECT grp, v FROM t_qo o WHERE v > (SELECT avg(v) FROM t_qo i WHERE i.grp = o.grp) ORDER BY grp, v

query
SELECT grp, v, (SELECT max(v) FROM t_qo) AS gmax FROM t_qo ORDER BY grp, v
