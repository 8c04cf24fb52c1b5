-- Lateral column aliases: a SELECT-list expression may reference an
-- earlier alias in BOTH engines (Spark 3.4's lateral-alias feature);
-- the scope DIVERGES in WHERE — DuckDB resolves select aliases there,
-- Spark does not (UNRESOLVED_COLUMN) — so portable SQL repeats the
-- expression or uses a subquery.  HAVING on a group key is shared.

statement
CREATE TABLE t_lca(x int) USING parquet

statement
INSERT INTO t_lca VALUES (1), (2), (3)

query
SELECT x + 1 AS y, (x + 1) * 2 AS z_expanded FROM t_lca ORDER BY x

-- alias-chained select list (the lateral alias feature itself)
query
SELECT x + 1 AS y, y * 2 AS z FROM t_lca ORDER BY x

-- portable WHERE spelling: subquery scope
query
SELECT y FROM (SELECT x + 1 AS y FROM t_lca) t WHERE y > 2 ORDER BY y

query
SELECT x FROM t_lca GROUP BY x HAVING x > 1 ORDER BY x
