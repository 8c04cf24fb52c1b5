-- CTE composition: chained CTEs referencing earlier ones, CTE
-- shadowing a table name, CTE referenced twice in one query.

statement
CREATE TABLE t_cte_base(k int, v int) USING parquet

statement
INSERT INTO t_cte_base VALUES (1, 10), (2, 20), (3, 30), (4, 40)

query
WITH a AS (SELECT k, v * 2 AS v2 FROM t_cte_base),
     b AS (SELECT k, v2 + 1 AS v3 FROM a WHERE k > 1)
SELECT k, v3 FROM b ORDER BY k

-- the CTE shadows the physical table for this query only
query
WITH t_cte_base AS (SELECT 99 AS k, 990 AS v)
SELECT k, v FROM t_cte_base

query
WITH s AS (SELECT k, v FROM t_cte_base WHERE v >= 20)
SELECT lo.k AS lo_k, hi.k AS hi_k FROM s lo JOIN s hi ON hi.v = lo.v + 10 ORDER BY lo_k

query
SELECT k, v FROM t_cte_base ORDER BY k LIMIT 2
