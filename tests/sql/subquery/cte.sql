statement
CREATE TABLE t_cte(grp string, v int) USING parquet

statement
INSERT INTO t_cte VALUES ('a', 1), ('a', 2), ('b', 3), ('b', 4)

query
WITH sums AS (SELECT grp, sum(v) AS s FROM t_cte GROUP BY grp), total AS (SELECT sum(s) AS t FROM sums) SELECT sums.grp, sums.s, total.t FROM sums CROSS JOIN total ORDER BY grp
