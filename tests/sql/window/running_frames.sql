statement
CREATE TABLE t_rf(grp string, seq int, v int) USING parquet

statement
INSERT INTO t_rf VALUES ('a', 1, 1), ('a', 2, 2), ('a', 3, 4), ('a', 4, 8), ('b', 1, 10)

query
SELECT grp, seq, sum(v) OVER (PARTITION BY grp ORDER BY seq ROWS UNBOUNDED PRECEDING) AS run, sum(v) OVER (PARTITION BY grp ORDER BY seq ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS win3, min(v) OVER (PARTITION BY grp ORDER BY seq ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tail_min FROM t_rf ORDER BY grp, seq
