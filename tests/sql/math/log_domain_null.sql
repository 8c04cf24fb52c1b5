-- ln/log10/log2/log(base,x) on zero and negative input (reference:
-- sql-tests/expressions/math/log.sql, log10.sql, log2.sql edge
-- tables).  Spark returns NULL for the whole non-positive domain
-- (Hive compat) in BOTH eval modes; DuckDB raises "cannot take
-- logarithm of zero" — Spark-only pins.  Positive-domain agreement
-- is covered differentially in log_exp.sql.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE ln(0.0) IS NULL AND ln(-1.0) IS NULL
  AND log10(0.0) IS NULL AND log10(-5.0) IS NULL
  AND log2(0.0) IS NULL AND log2(-1.0) IS NULL
  AND log(0.0, 10.0) IS NULL AND log(10.0, 0.0) IS NULL
  AND log(-1.0, 10.0) IS NULL AND log(10.0, -1.0) IS NULL

-- base-1 logarithm: ln(x)/ln(1) = x/0 — Spark evaluates the ratio,
-- so log(1, 1) is NaN (0/0) and log(1, 2) is Infinity
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(log(1.0, 1.0))
  AND log(1.0, 2.0) = CAST('Infinity' AS DOUBLE)
  AND log(1.0, 0.5) = CAST('-Infinity' AS DOUBLE)

-- non-finite propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE ln(CAST('Infinity' AS DOUBLE)) = CAST('Infinity' AS DOUBLE)
  AND isnan(ln(CAST('NaN' AS DOUBLE)))
  AND log10(CAST('Infinity' AS DOUBLE)) = CAST('Infinity' AS DOUBLE)
