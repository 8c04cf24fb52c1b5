-- Correlated scalar subqueries in the SELECT list — per-row lookup
-- rewritten to a left join by both planners; NULL when no match.

statement
CREATE TABLE t_sis(k int, v int) USING parquet

statement
CREATE TABLE t_sis_d(k int, name string) USING parquet

statement
INSERT INTO t_sis VALUES (1, 10), (2, 20), (3, 30)

statement
INSERT INTO t_sis_d VALUES (1, 'one'), (2, 'two')

query
SELECT k, v, (SELECT name FROM t_sis_d d WHERE d.k = t.k) AS name FROM t_sis t ORDER BY k

query
SELECT k, (SELECT count(*) FROM t_sis u WHERE u.v <= t.v) AS rank_by_count FROM t_sis t ORDER BY k

query
SELECT k, v - (SELECT avg(v) FROM t_sis) AS dev FROM t_sis t ORDER BY k
