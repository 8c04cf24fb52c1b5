-- WITH RECURSIVE (Spark 4.0 added it; reference-era Spark lacked it —
-- superset surface).  Series generation and transitive closure.

query
WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 10) SELECT count(*) AS c, sum(n) AS s, max(n) AS m FROM r

query
WITH RECURSIVE fib(a, b, i) AS (
  SELECT 0, 1, 1
  UNION ALL
  SELECT b, a + b, i + 1 FROM fib WHERE i < 10
)
SELECT max(b) AS fib10 FROM fib

statement
CREATE TABLE t_edges(src int, dst int) USING parquet

statement
INSERT INTO t_edges VALUES (1, 2), (2, 3), (3, 4), (10, 11)

query
WITH RECURSIVE reach(node) AS (
  SELECT 1
  UNION ALL
  SELECT e.dst FROM t_edges e JOIN reach r ON e.src = r.node
)
SELECT node FROM reach ORDER BY node
