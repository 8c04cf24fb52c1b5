-- floor/ceil/sign over IEEE special values (reference:
-- sql-tests/expressions/math/floor.sql, ceil.sql, signum.sql — their
-- edge tables carry ±Inf/NaN/-0.0/denormal rows).  Spark's
-- floor/ceil(double) return BIGINT and SATURATE on non-finite input
-- instead of raising (java Math.floor then long cast): Infinity
-- clamps to LONG_MAX, -Infinity to LONG_MIN, and NaN becomes 0 —
-- Spark-only pins (DuckDB floor returns DOUBLE and keeps Inf/NaN).

-- saturation at the non-finite edges — probed on Spark 4.1
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE floor(CAST('Infinity' AS DOUBLE)) = 9223372036854775807
  AND ceil(CAST('Infinity' AS DOUBLE)) = 9223372036854775807
  AND floor(CAST('-Infinity' AS DOUBLE)) = -9223372036854775808
  AND ceil(CAST('-Infinity' AS DOUBLE)) = -9223372036854775808
  AND floor(CAST('NaN' AS DOUBLE)) = 0
  AND ceil(CAST('NaN' AS DOUBLE)) = 0

-- negative zero: floor/ceil land on integer 0; sign PRESERVES the
-- sign bit (-0.0, not 0.0) yet -0.0 = 0.0 under SQL comparison
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE floor(CAST('-0.0' AS DOUBLE)) = 0
  AND ceil(CAST('-0.0' AS DOUBLE)) = 0
  AND sign(CAST('-0.0' AS DOUBLE)) = CAST('0.0' AS DOUBLE)
  AND CAST(sign(CAST('-0.0' AS DOUBLE)) AS STRING) = '-0.0'
  AND CAST('-0.0' AS DOUBLE) = CAST('0.0' AS DOUBLE)

-- sign propagates NaN (it is NOT a three-valued -1/0/1 on doubles);
-- ±Infinity collapse to ±1; the smallest denormal is strictly
-- positive to sign() even though it rounds to 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(sign(CAST('NaN' AS DOUBLE)))
  AND sign(CAST('Infinity' AS DOUBLE)) = 1.0
  AND sign(CAST('-Infinity' AS DOUBLE)) = -1.0
  AND sign(CAST(4.9406564584124654e-324 AS DOUBLE)) = 1.0
  AND round(CAST(4.9406564584124654e-324 AS DOUBLE), 0) = 0.0

-- division BY infinity preserves the sign bit through to -0.0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(CAST(1.0 AS DOUBLE) / CAST('-Infinity' AS DOUBLE) AS STRING) = '-0.0'
  AND CAST(CAST(1.0 AS DOUBLE) / CAST('Infinity' AS DOUBLE) AS STRING) = '0.0'

-- finite-value agreement with DuckDB: integer-valued outputs of
-- floor/ceil/sign on ordinary doubles (BIGINT-vs-DOUBLE result types
-- compare exactly through the runner's Fraction path)
query
SELECT floor(CAST(2.7 AS DOUBLE)) AS f1, ceil(CAST(2.2 AS DOUBLE)) AS c1,
       floor(CAST(-2.2 AS DOUBLE)) AS f2, ceil(CAST(-2.7 AS DOUBLE)) AS c2,
       sign(CAST(-3.5 AS DOUBLE)) AS s1, sign(CAST(0.0 AS DOUBLE)) AS s2,
       sign(42) AS s3
