-- CREATE TABLE AS SELECT and INSERT INTO ... SELECT — derived-table
-- materialization both engines run with identical semantics.

statement
CREATE TABLE t_src(k int, v int) USING parquet

statement
INSERT INTO t_src VALUES (1, 10), (2, 20), (3, 30)

statement
CREATE TABLE t_ctas USING parquet AS SELECT k, v * 2 AS v2 FROM t_src WHERE v > 10

query
SELECT k, v2 FROM t_ctas ORDER BY k

statement
INSERT INTO t_ctas SELECT k, v + 1 FROM t_src WHERE k = 1

query
SELECT k, v2 FROM t_ctas ORDER BY k, v2

query
SELECT count(*) AS n, sum(v2) AS s FROM t_ctas
