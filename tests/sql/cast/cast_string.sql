statement
CREATE TABLE t_casts(s string) USING parquet

statement
INSERT INTO t_casts VALUES ('123'), (' 42 '), ('abc'), ('1999-12-31'), (NULL)

query
SELECT try_cast(s AS int) AS i, try_cast(s AS date) AS dt, try_cast(s AS double) AS d FROM t_casts ORDER BY s NULLS FIRST
