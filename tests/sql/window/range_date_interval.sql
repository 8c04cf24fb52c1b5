-- RANGE frames keyed on a DATE column with INTERVAL bounds — the
-- time-windowed running aggregate both engines plan as a range frame.

statement
CREATE TABLE t_rdi(g string, dt date, v int) USING parquet

statement
INSERT INTO t_rdi VALUES ('a', DATE '2020-01-01', 1), ('a', DATE '2020-01-03', 3), ('a', DATE '2020-01-04', 4), ('a', DATE '2020-01-10', 10), ('b', DATE '2020-02-01', 5), ('b', DATE '2020-02-05', 7)

query
SELECT g, dt, sum(v) OVER (PARTITION BY g ORDER BY dt RANGE BETWEEN INTERVAL '2' DAY PRECEDING AND CURRENT ROW) AS s2d FROM t_rdi ORDER BY g, dt

query
SELECT g, dt, count(*) OVER (PARTITION BY g ORDER BY dt RANGE BETWEEN CURRENT ROW AND INTERVAL '6' DAY FOLLOWING) AS n_ahead FROM t_rdi ORDER BY g, dt

query
SELECT g, dt, avg(v) OVER (PARTITION BY g ORDER BY dt RANGE BETWEEN INTERVAL '3' DAY PRECEDING AND INTERVAL '1' DAY PRECEDING) AS trailing_avg FROM t_rdi ORDER BY g, dt
