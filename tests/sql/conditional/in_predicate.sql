statement
CREATE TABLE t_in(i int, s string) USING parquet

statement
INSERT INTO t_in VALUES (1, 'a'), (2, 'b'), (3, 'c'), (NULL, 'd')

query
SELECT i, i IN (1, 3) AS in13, s IN ('a', 'z') AS in_az, i NOT IN (2) AS not2 FROM t_in ORDER BY i NULLS FIRST
