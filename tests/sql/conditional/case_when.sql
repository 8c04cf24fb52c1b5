statement
CREATE TABLE t_case(i int) USING parquet

statement
INSERT INTO t_case VALUES (1), (2), (3), (NULL)

query
SELECT i, CASE WHEN i = 1 THEN 'one' WHEN i = 2 THEN 'two' ELSE 'many' END AS w, CASE i WHEN 1 THEN 'a' WHEN 2 THEN 'b' END AS s FROM t_case ORDER BY i NULLS FIRST
