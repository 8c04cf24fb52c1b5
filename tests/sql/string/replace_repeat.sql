statement
CREATE TABLE t_rep(s string) USING parquet

statement
INSERT INTO t_rep VALUES ('aaa'), ('abcabc'), (''), (NULL)

query
SELECT replace(s, 'a', 'X') AS r, repeat(s, 2) AS rp, reverse(s) AS rv FROM t_rep ORDER BY s NULLS FIRST
