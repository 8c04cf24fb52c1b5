statement
CREATE TABLE t_castn(i int, d double) USING parquet

statement
INSERT INTO t_castn VALUES (42, 42.0), (-7, -7.25), (NULL, NULL)

query
SELECT cast(i AS bigint) AS i64, cast(i AS double) AS idbl, cast(i AS string) AS istr, try_cast(d AS int) IS NOT NULL AS d_ok FROM t_castn ORDER BY i NULLS FIRST
