-- nth_value over full frames; lead/lag with explicit defaults.
-- IGNORE NULLS is Spark-only grammar at this position (DuckDB parses
-- it only inside the argument list), pinned separately.

statement
CREATE TABLE t_nv(k int, g string, v int) USING parquet

statement
INSERT INTO t_nv VALUES (1, 'a', 10), (2, 'a', NULL), (3, 'a', 30), (4, 'b', 40), (5, 'b', 50)

query
SELECT k, nth_value(v, 2) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv2 FROM t_nv ORDER BY k

query
SELECT k, lead(v, 1, -1) OVER (PARTITION BY g ORDER BY k) AS ld, lag(v, 2, -99) OVER (PARTITION BY g ORDER BY k) AS lg FROM t_nv ORDER BY k

-- expect-rows: 5
query spark_only
SELECT k, first_value(v) IGNORE NULLS OVER (PARTITION BY g ORDER BY k DESC) AS fv FROM t_nv ORDER BY k

-- expect-rows: 5
query spark_only
SELECT k, last_value(v) IGNORE NULLS OVER (PARTITION BY g ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv FROM t_nv ORDER BY k
