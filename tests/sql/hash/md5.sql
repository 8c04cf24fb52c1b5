statement
CREATE TABLE t_md5(s string) USING parquet

statement
INSERT INTO t_md5 VALUES ('abc'), (''), ('The quick brown fox'), (NULL)

query
SELECT md5(s) AS h FROM t_md5 ORDER BY s NULLS FIRST
