statement
CREATE TABLE t_lr(s string) USING parquet

statement
INSERT INTO t_lr VALUES ('hello world'), ('a,b,c'), ('')

-- NULL input excluded: DuckDB split_part(NULL, ...) yields '' where
-- Spark propagates NULL
query
SELECT left(s, 3) AS l3, right(s, 3) AS r3, split_part(s, ',', 2) AS sp2 FROM t_lr ORDER BY s
