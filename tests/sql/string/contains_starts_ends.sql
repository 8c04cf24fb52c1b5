statement
CREATE TABLE t_cse(s string) USING parquet

statement
INSERT INTO t_cse VALUES ('apple pie'), ('pie apple'), ('banana'), (NULL)

query
SELECT contains(s, 'apple') AS c, s LIKE 'apple%' AS st, s LIKE '%pie' AS en FROM t_cse ORDER BY s NULLS FIRST
