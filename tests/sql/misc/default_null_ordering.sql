-- DIVERGENCE (documented): the DEFAULT null position in ORDER BY —
-- Spark places NULLs FIRST ascending (and LAST descending); DuckDB
-- defaults NULLS LAST ascending.  Any cross-engine ORDER BY with
-- nullable keys must spell NULLS FIRST/LAST explicitly (the explicit
-- forms are differential in order_nulls_collation.sql).  CASE-wrapped
-- EXISTS and ORDER BY aggregate are shared.

statement
CREATE TABLE t_dno(x int) USING parquet

statement
INSERT INTO t_dno VALUES (2), (NULL), (1)

-- explicit spelling: identical everywhere
query
SELECT x FROM t_dno ORDER BY x NULLS FIRST

query
SELECT x FROM t_dno ORDER BY x DESC NULLS LAST

-- Spark's implicit default = NULLS FIRST ascending
-- expect-rows: 3
query spark_only
SELECT x FROM t_dno ORDER BY x

query
SELECT x, CASE WHEN EXISTS (SELECT 1 FROM t_dno i WHERE i.x = o.x) THEN 'hit' ELSE 'miss' END AS tag FROM (VALUES (1), (9)) o(x) ORDER BY x

query
SELECT x % 2 AS par, sum(x) AS s FROM t_dno WHERE x IS NOT NULL GROUP BY x % 2 ORDER BY sum(x) DESC
