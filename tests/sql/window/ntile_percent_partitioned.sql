statement
CREATE TABLE t_np(grp string, v int) USING parquet

statement
INSERT INTO t_np VALUES ('a', 1), ('a', 2), ('a', 3), ('a', 4), ('a', 5), ('b', 10), ('b', 20)

query tolerance=1e-9
SELECT grp, v, ntile(2) OVER w AS half, round(percent_rank() OVER w, 6) AS pr, round(cume_dist() OVER w, 6) AS cd FROM t_np WINDOW w AS (PARTITION BY grp ORDER BY v) ORDER BY grp, v
