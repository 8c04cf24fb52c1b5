statement
CREATE TABLE t_gs(a string, b string, v int) USING parquet

statement
INSERT INTO t_gs VALUES ('x', 'p', 1), ('x', 'q', 2), ('y', 'p', 4), ('y', 'q', 8)

query
SELECT a, b, sum(v) AS s FROM t_gs GROUP BY GROUPING SETS ((a, b), (a), ()) ORDER BY a NULLS FIRST, b NULLS FIRST

query
SELECT a, b, sum(v) AS s FROM t_gs GROUP BY ROLLUP (a, b) ORDER BY a NULLS FIRST, b NULLS FIRST

query
SELECT a, b, sum(v) AS s FROM t_gs GROUP BY CUBE (a, b) ORDER BY a NULLS FIRST, b NULLS FIRST
