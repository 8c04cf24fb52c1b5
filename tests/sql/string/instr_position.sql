-- instr / position: 1-based find, 0 when absent, NULL propagation.
-- locate() is Spark-only surface (DuckDB spells it strpos).

statement
CREATE TABLE t_ip(s string, sub string) USING parquet

statement
INSERT INTO t_ip VALUES ('hello', 'll'), ('hello', 'z'), ('hello', ''), (NULL, 'x'), ('abcabc', 'bc')

query
SELECT s, sub, instr(s, sub) AS pos FROM t_ip ORDER BY s NULLS FIRST, sub

query
SELECT position('ll' in 'hello') AS p1, position('zz' in 'hello') AS p0

-- expect-rows: 5
query spark_only
SELECT s, locate(sub, s) AS pos, locate(sub, s, 2) AS pos_from2 FROM t_ip ORDER BY s NULLS FIRST, sub
