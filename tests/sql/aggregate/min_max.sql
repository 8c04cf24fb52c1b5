statement
CREATE TABLE t_mm(i int, d double, s string, dt date) USING parquet

statement
INSERT INTO t_mm VALUES (3, -1.5, 'apple', DATE '2020-01-01'), (-7, 2.25, 'Banana', DATE '1999-12-31'), (NULL, NULL, NULL, NULL)

query
SELECT min(i) AS mn_i, max(i) AS mx_i, min(d) AS mn_d, max(d) AS mx_d, min(s) AS mn_s, max(s) AS mx_s, min(dt) AS mn_dt, max(dt) AS mx_dt FROM t_mm
