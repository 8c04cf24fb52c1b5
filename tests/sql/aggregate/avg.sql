statement
CREATE TABLE t_avg(i int, d double, grp string) USING parquet

statement
INSERT INTO t_avg VALUES (1, 1.0, 'a'), (2, 2.0, 'a'), (4, 4.5, 'b'), (NULL, NULL, 'b')

query tolerance=1e-9
SELECT avg(i) AS ai, avg(d) AS ad FROM t_avg

query tolerance=1e-9
SELECT grp, avg(i) AS ai FROM t_avg GROUP BY grp ORDER BY grp
