statement
CREATE TABLE t_idf(a int, b int) USING parquet

statement
INSERT INTO t_idf VALUES (1, 1), (1, 2), (NULL, 1), (NULL, NULL)

query
SELECT a, b, a IS DISTINCT FROM b AS idf, a IS NOT DISTINCT FROM b AS nidf FROM t_idf ORDER BY a NULLS FIRST, b NULLS FIRST
