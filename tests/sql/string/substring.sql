statement
CREATE TABLE t_sub(s string) USING parquet

statement
INSERT INTO t_sub VALUES ('hello world'), ('ab'), (''), (NULL)

query
SELECT substring(s, 1, 5) AS s15, substring(s, 7) AS s7, substring(s, 2, 100) AS s2big FROM t_sub ORDER BY s NULLS FIRST
