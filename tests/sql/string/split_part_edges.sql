-- split_part edge semantics shared by Spark and DuckDB: negative index
-- counts from the end; both engines 1-index.

statement
CREATE TABLE t_spe(s string) USING parquet

statement
INSERT INTO t_spe VALUES ('a,b,c'), ('one'), (',lead'), ('trail,')

query
SELECT s, split_part(s, ',', 1) AS p1, split_part(s, ',', 2) AS p2, split_part(s, ',', -1) AS plast FROM t_spe ORDER BY s

query
SELECT split_part('a,b,c', ',', -2) AS pm2, split_part('x.y.z', '.', 3) AS p3
