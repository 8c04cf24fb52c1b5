-- Decimal precision/scale propagation through *, /, +: Spark keeps
-- exact decimal results (scale rules from SQL Server lineage), DuckDB
-- widens division to DOUBLE — values agree numerically (the runner
-- compares Decimals numerically), the propagation rule itself is what
-- this file exercises.

statement
CREATE TABLE t_dp(a decimal(10,2), b decimal(10,2)) USING parquet

statement
INSERT INTO t_dp VALUES (1.25, 4.50), (10.00, 3.00), (99999999.99, 0.01)

query
SELECT a, b, a * b AS prod FROM t_dp ORDER BY a

query
SELECT a, b, a + b AS add_r, a - b AS sub_r FROM t_dp ORDER BY a

query tolerance=1e-9
SELECT a, b, a / b AS div_r FROM t_dp WHERE b <> 0 ORDER BY a

query
SELECT CAST(1 AS DECIMAL(5,0)) + CAST(0.001 AS DECIMAL(5,3)) AS mixed_scale

-- AGGREGATE result-type rules (round 8): Spark's sum over
-- DECIMAL(p,s) widens precision by 10 (p+10, s); avg widens BOTH by
-- 4 (p+4, s+4) — the fixed headroom that makes decimal aggregation
-- overflow-safe without per-row checks.  DuckDB returns DOUBLE for
-- avg over decimal, which is exactly why the repo's oracle-boundary
-- rule rounds-and-casts every decimal aggregate to DOUBLE before it
-- leaves a query (COMPAT.md "oracle-authoring rules").  Spark-only
-- typeof pins; the VALUES agree differentially in the files above.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE typeof((SELECT sum(a) FROM t_dp)) = 'decimal(20,2)'
  AND typeof((SELECT avg(a) FROM t_dp)) = 'decimal(14,6)'
  AND typeof(CAST(1.5 AS DECIMAL(5,2)) * CAST(1.5 AS DECIMAL(5,2))) = 'decimal(11,4)'
