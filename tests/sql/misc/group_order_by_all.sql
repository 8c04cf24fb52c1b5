-- GROUP BY ALL / ordinal grouping / ORDER BY ALL / aggregate HAVING
-- without GROUP BY — modern SQL shorthand both engines accept.

statement
CREATE TABLE t_gba(k int, g string, v int) USING parquet

statement
INSERT INTO t_gba VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 5), (4, 'b', NULL)

query
SELECT g, count(v) AS n, sum(v) AS s FROM t_gba GROUP BY ALL ORDER BY g

query
SELECT g, sum(v) AS s FROM t_gba GROUP BY 1 ORDER BY 1

query
SELECT sum(v) AS total FROM t_gba HAVING sum(v) > 30

query
SELECT g, v FROM t_gba WHERE v IS NOT NULL ORDER BY ALL
