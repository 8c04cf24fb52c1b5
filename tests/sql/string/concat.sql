statement
CREATE TABLE t_concat(a string, b string) USING parquet

statement
INSERT INTO t_concat VALUES ('foo', 'bar'), ('', 'x'), ('y', ''), (NULL, 'z')

query
SELECT a || b AS ab FROM t_concat ORDER BY a NULLS FIRST

-- concat() diverges on NULL between engines (Spark propagates,
-- DuckDB skips) -- compared on non-null rows only
query
SELECT concat(a, b) AS cab FROM t_concat WHERE a IS NOT NULL AND b IS NOT NULL ORDER BY a
