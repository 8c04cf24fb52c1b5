statement
CREATE TABLE t_med(x int, grp string) USING parquet

statement
INSERT INTO t_med VALUES (1, 'a'), (3, 'a'), (5, 'a'), (2, 'b'), (2, 'b'), (9, 'b'), (NULL, 'b')

query tolerance=1e-12
SELECT grp, median(x) AS med FROM t_med GROUP BY grp ORDER BY grp

query
SELECT mode(x) AS m FROM t_med WHERE grp = 'b'
