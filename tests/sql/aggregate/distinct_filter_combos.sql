-- DISTINCT + FILTER composition on aggregates (the Expand-rewrite
-- corner the reference's HashAggregate handles through its
-- multi-distinct path): distinct with a filter, multiple distincts
-- beside plain aggregates, NULL-skipping counts per group.

statement
CREATE TABLE t_dfc(g string, x int, y string) USING parquet

statement
INSERT INTO t_dfc VALUES ('a', 1, 'p'), ('a', 2, 'p'), ('a', 2, 'q'), ('a', NULL, 'q'), ('b', 3, 'r'), ('b', NULL, NULL)

query
SELECT count(DISTINCT x) FILTER (WHERE x > 1) AS cdf, sum(x) AS s FROM t_dfc

query
SELECT sum(DISTINCT x) FILTER (WHERE x < 3) AS sdf, count(*) AS n FROM t_dfc

query
SELECT g, count(DISTINCT x) AS cdx, count(DISTINCT y) AS cdy, count(x) AS cx, avg(x) AS a FROM t_dfc GROUP BY g ORDER BY g

query
SELECT g, count(DISTINCT x) FILTER (WHERE y = 'p') AS cd_p FROM t_dfc GROUP BY g ORDER BY g
