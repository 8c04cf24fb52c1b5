-- negative()/positive() named unary operators (reference:
-- sql-tests/expressions/math/arithmetic.sql covers unary minus; the
-- named forms are Spark-specific — DuckDB has neither).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE negative(5) = -5 AND negative(-5) = 5
  AND positive(-3) = -3 AND positive(3) = 3
  AND negative(0) = 0
  AND negative(NULL) IS NULL AND positive(NULL) IS NULL

-- type preservation: negative keeps the input type (int stays int,
-- double stays double, decimal stays decimal)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE typeof(negative(5)) = 'int'
  AND typeof(negative(CAST(5 AS BIGINT))) = 'bigint'
  AND typeof(negative(5.5)) = 'decimal(2,1)'
  AND typeof(negative(CAST(5.5 AS DOUBLE))) = 'double'

-- unary minus on double zero preserves the sign bit
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(negative(CAST(0.0 AS DOUBLE)) AS STRING) = '-0.0'
  AND CAST(positive(CAST('-0.0' AS DOUBLE)) AS STRING) = '-0.0'
