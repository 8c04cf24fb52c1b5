-- cot over finite points, the pole at 0, and non-finite input
-- (reference: sql-tests/expressions/math/cot.sql).  Finite points are
-- differential; the pole diverges BETWEEN engines: Spark cot(0) =
-- 1/tan(0) = +Infinity, DuckDB raises Out of Range — Spark-only pin.

statement
CREATE TABLE t_cot(x double) USING parquet

statement
INSERT INTO t_cot VALUES (1.0), (-1.0), (0.5), (2.0), (NULL)

query tolerance=1e-12
SELECT x, cot(x) AS c FROM t_cot ORDER BY x NULLS FIRST

-- the pole and non-finite propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE cot(0.0) = CAST('Infinity' AS DOUBLE)
  AND isnan(cot(CAST('Infinity' AS DOUBLE)))
  AND isnan(cot(CAST('NaN' AS DOUBLE)))
  AND cot(NULL) IS NULL
