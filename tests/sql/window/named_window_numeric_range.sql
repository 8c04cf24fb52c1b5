-- Named WINDOW clause reuse, numeric RANGE frames (value-distance,
-- not row-count), and a fully-preceding ROWS frame (the lag-window
-- shape whose frame excludes the current row).

statement
CREATE TABLE t_nwr(g string, s int, v int) USING parquet

statement
INSERT INTO t_nwr VALUES ('a', 1, 10), ('a', 2, 20), ('a', 3, 30), ('a', 9, 90), ('b', 1, 5)

query
SELECT g, s, sum(v) OVER (PARTITION BY g ORDER BY s ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS lag_sum FROM t_nwr ORDER BY g, s

-- RANGE with numeric offsets: s=9 is alone in its +-2 value band
query
SELECT g, s, count(*) OVER (PARTITION BY g ORDER BY s RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS band_n, min(v) OVER (PARTITION BY g ORDER BY s RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS band_min FROM t_nwr ORDER BY g, s

-- one WINDOW definition shared by several functions
query
SELECT g, s, row_number() OVER w AS rn, rank() OVER w AS rk, sum(v) OVER w AS run FROM t_nwr WINDOW w AS (PARTITION BY g ORDER BY s) ORDER BY g, s
