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
