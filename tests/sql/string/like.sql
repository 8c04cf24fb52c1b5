statement
CREATE TABLE t_like(s string) USING parquet

statement
INSERT INTO t_like VALUES ('apple'), ('application'), ('banana'), ('APPLE'), (NULL)

query
SELECT s, s LIKE 'app%' AS starts, s LIKE '%an%' AS has_an, s LIKE '_pple' AS one_then FROM t_like ORDER BY s NULLS FIRST
