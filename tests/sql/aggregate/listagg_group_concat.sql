-- listagg / string_agg (Spark 4 added both; DuckDB has both).  The
-- deterministic-order WITHIN GROUP form is Spark-only spelling (DuckDB
-- orders via string_agg(x, sep ORDER BY ...), a different grammar), so
-- the shared blocks aggregate single-row groups to stay order-free.

statement
CREATE TABLE t_la(g string, s string, v int) USING parquet

statement
INSERT INTO t_la VALUES ('a', 'x', 2), ('a', 'y', 1), ('b', 'z', 3), ('b', NULL, 4)

query
SELECT g, count(s) AS n, min(s) AS lo, max(s) AS hi FROM t_la GROUP BY g ORDER BY g

-- single-element groups: concatenation order cannot differ
query
SELECT s, listagg(s, '|') AS la, string_agg(s, '|') AS sa FROM t_la WHERE s IS NOT NULL GROUP BY s ORDER BY s

-- expect-rows: 1
query spark_only
SELECT listagg(s, '|') WITHIN GROUP (ORDER BY v) AS la FROM t_la HAVING listagg(s, '|') WITHIN GROUP (ORDER BY v) = 'y|x|z'
