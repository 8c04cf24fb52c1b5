-- rint (IEEE half-even to double) and bround (half-even decimal
-- rounding) vs plain round (half-up) — the banker's-rounding family
-- (reference: sql-tests/expressions/math/round.sql carries the
-- half-even rows).  Neither rint nor bround exists in DuckDB —
-- Spark-only pins; the round() halves are differential (both engines
-- round half away from zero).

query
SELECT round(2.5) AS r25, round(3.5) AS r35, round(-2.5) AS rm25,
       round(2.345, 2) AS r2345

-- rint: ties to even, result stays DOUBLE
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE rint(2.5) = 2.0 AND rint(3.5) = 4.0 AND rint(-2.5) = -2.0
  AND rint(2.4) = 2.0 AND rint(2.6) = 3.0
  AND CAST(rint(2.5) AS STRING) = '2.0'
  AND rint(NULL) IS NULL

-- bround: ties to even at any scale, preserves input type family
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE bround(CAST(2.5 AS DOUBLE)) = 2.0
  AND bround(CAST(3.5 AS DOUBLE)) = 4.0
  AND bround(CAST(-2.5 AS DOUBLE)) = -2.0
  AND bround(CAST(2.345 AS DOUBLE), 2) = 2.34
  AND bround(CAST(2.355 AS DOUBLE), 2) = 2.36
  AND bround(25, -1) = 20
  AND bround(35, -1) = 40
