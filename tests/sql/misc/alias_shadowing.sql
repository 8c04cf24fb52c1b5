-- Alias-vs-column shadowing rules, identical in both engines and
-- subtle enough to pin: when a SELECT alias REUSES a source column
-- name, GROUP BY binds the SOURCE COLUMN (grouping on x, emitting
-- x+1 per group) while ORDER BY binds the ALIAS (sorting by -x, not
-- x).  Expression ORDER BY keys over source columns also shared.

statement
CREATE TABLE t_ash(x int) USING parquet

statement
INSERT INTO t_ash VALUES (1), (2), (5)

-- GROUP BY x = the source column; output is x+1 per group
query
SELECT x + 1 AS x FROM t_ash GROUP BY x ORDER BY 1

-- ORDER BY x = the alias (-x): ascending by the NEGATED value
query
SELECT -x AS x FROM t_ash ORDER BY x

query
SELECT x FROM t_ash ORDER BY abs(x - 2), x
