-- LATERAL correlated subqueries in FROM — per-row dependent join,
-- planned as a correlated rewrite (both engines decorrelate).

statement
CREATE TABLE t_lat(k int, v int) USING parquet

statement
INSERT INTO t_lat VALUES (1, 10), (2, 20), (3, 30)

query
SELECT t.k, u.mx FROM t_lat t, LATERAL (SELECT max(v) AS mx FROM t_lat WHERE k <= t.k) u ORDER BY t.k

query
SELECT t.k, u.n FROM t_lat t, LATERAL (SELECT count(*) AS n FROM t_lat WHERE v > t.v) u ORDER BY t.k

query
SELECT t.k, u.vv FROM t_lat t, LATERAL (SELECT t.v * 2 AS vv) u ORDER BY t.k
