statement
CREATE TABLE t_flv(grp string, seq int, v int) USING parquet

statement
INSERT INTO t_flv VALUES ('a', 1, 5), ('a', 2, NULL), ('a', 3, 9), ('b', 1, 2)

query
SELECT grp, seq, first_value(v) OVER w AS fv, last_value(v) OVER (PARTITION BY grp ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv FROM t_flv WINDOW w AS (PARTITION BY grp ORDER BY seq) ORDER BY grp, seq
