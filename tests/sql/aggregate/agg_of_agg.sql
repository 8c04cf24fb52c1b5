-- Aggregation composition: statistics over per-group aggregates,
-- window functions over an aggregated subquery, HAVING on computed
-- aggregates, GROUP BY expression.

statement
CREATE TABLE t_aoa(g string, sub string, v int) USING parquet

statement
INSERT INTO t_aoa VALUES ('a', 'x', 1), ('a', 'x', 2), ('a', 'y', 10), ('b', 'z', 4), ('b', 'z', 6), ('b', 'w', 100)

query
SELECT avg(gs) AS avg_group_sum, max(gs) AS max_group_sum FROM (SELECT g, sub, sum(v) AS gs FROM t_aoa GROUP BY g, sub) t

query
SELECT g, sub, gs, rank() OVER (PARTITION BY g ORDER BY gs DESC) AS rk FROM (SELECT g, sub, sum(v) AS gs FROM t_aoa GROUP BY g, sub) t ORDER BY g, rk, sub

query
SELECT g, sum(v) AS s FROM t_aoa GROUP BY g HAVING count(*) > 2 AND sum(v) > 10 ORDER BY g

query
SELECT v % 3 AS bucket, count(*) AS n, sum(v) AS s FROM t_aoa GROUP BY v % 3 ORDER BY bucket
