statement
CREATE TABLE t_trim(s string) USING parquet

statement
INSERT INTO t_trim VALUES ('  pad  '), ('none'), ('   '), (NULL)

query
SELECT trim(s) AS t, ltrim(s) AS lt, rtrim(s) AS rt, length(s) AS n FROM t_trim ORDER BY s NULLS FIRST
