-- expm1/log1p — the precision-preserving small-x forms (reference:
-- sql-tests/expressions/math/expm1.sql).  DuckDB ships neither —
-- Spark-only pins, including the catastrophic-cancellation case that
-- motivates the functions' existence.

-- expm1 identities and null propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE expm1(0.0) = 0.0
  AND abs(expm1(1.0) - (exp(1.0) - 1)) < 1e-15
  AND abs(expm1(-1.0) + 0.6321205588285577) < 1e-16
  AND expm1(NULL) IS NULL

-- small-x precision: expm1(1e-15) keeps ~16 digits where exp(x)-1
-- collapses to the nearest double of 1.1102e-15
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE abs(expm1(CAST(1e-15 AS DOUBLE)) - 1.0000000000000005e-15) < 1e-30
  AND expm1(CAST(1e-15 AS DOUBLE)) <> exp(CAST(1e-15 AS DOUBLE)) - 1

-- log1p: domain (-1, inf); AT and below -1 Spark yields NULL (not
-- -Infinity/NaN — the Hive-compat null-on-domain-error convention,
-- same as ln)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE log1p(0.0) = 0.0
  AND abs(log1p(1.0) - 0.6931471805599453) < 1e-16
  AND log1p(-1.0) IS NULL
  AND log1p(-2.0) IS NULL
  AND log1p(NULL) IS NULL
