-- sin/cos/tan on non-finite input (reference:
-- sql-tests/expressions/math/sin.sql, cos.sql, tan.sql edge rows).
-- Finite-domain agreement is covered in trig.sql; the non-finite
-- rows diverge (DuckDB raises Out of Range on ±Infinity) —
-- Spark-only pins: java returns NaN for every non-finite argument.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(sin(CAST('Infinity' AS DOUBLE)))
  AND isnan(sin(CAST('-Infinity' AS DOUBLE)))
  AND isnan(cos(CAST('Infinity' AS DOUBLE)))
  AND isnan(tan(CAST('-Infinity' AS DOUBLE)))
  AND isnan(sin(CAST('NaN' AS DOUBLE)))
  AND isnan(cos(CAST('NaN' AS DOUBLE)))
  AND isnan(tan(CAST('NaN' AS DOUBLE)))
  AND sin(NULL) IS NULL AND cos(NULL) IS NULL AND tan(NULL) IS NULL

-- periodicity sanity at a representable multiple of pi: tan flips
-- sign across pi/2 poles but never overflows (no exact pole exists
-- in binary64)
query tolerance=1e-9
SELECT sin(pi()) AS s, cos(pi()) AS c, tan(pi()) AS t
