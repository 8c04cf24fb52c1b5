statement
CREATE TABLE t_sd(grp string, v int) USING parquet

statement
INSERT INTO t_sd VALUES ('a', 5), ('a', 5), ('a', 7), ('b', 1), ('b', NULL)

query tolerance=1e-12
SELECT grp, sum(DISTINCT v) AS sd, avg(DISTINCT v) AS ad, count(DISTINCT v) AS cd FROM t_sd GROUP BY grp ORDER BY grp
