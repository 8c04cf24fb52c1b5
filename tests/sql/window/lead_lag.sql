statement
CREATE TABLE t_ll(grp string, seq int, v int) USING parquet

statement
INSERT INTO t_ll VALUES ('a', 1, 100), ('a', 2, 200), ('a', 3, 300), ('b', 1, 7)

query
SELECT grp, seq, lag(v) OVER (PARTITION BY grp ORDER BY seq) AS prev, lead(v) OVER (PARTITION BY grp ORDER BY seq) AS nxt, lag(v, 2, -1) OVER (PARTITION BY grp ORDER BY seq) AS prev2 FROM t_ll ORDER BY grp, seq
