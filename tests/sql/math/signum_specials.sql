-- signum as a distinct function name (reference:
-- sql-tests/expressions/math/signum.sql; sign() specials are pinned
-- in saturating_floor_ceil_sign.sql — this file pins the signum
-- alias and the decimal-vs-double input distinction).  DuckDB has
-- sign() but no signum() — Spark-only pins.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE signum(42.5) = 1.0 AND signum(-7) = -1.0 AND signum(0) = 0.0
  AND signum(CAST('Infinity' AS DOUBLE)) = 1.0
  AND signum(CAST('-Infinity' AS DOUBLE)) = -1.0
  AND isnan(signum(CAST('NaN' AS DOUBLE)))
  AND signum(NULL) IS NULL

-- a DECIMAL literal -0.0 normalizes to zero BEFORE signum sees it, so
-- the sign bit is gone (contrast the double pin in
-- saturating_floor_ceil_sign.sql where signum preserves '-0.0')
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(signum(-0.0) AS STRING) = '0.0'
  AND CAST(signum(CAST('-0.0' AS DOUBLE)) AS STRING) = '-0.0'
