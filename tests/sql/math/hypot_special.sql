-- hypot / log1p / expm1 / rint — the IEEE special-function set Spark
-- carries from java.lang.Math (DuckDB lacks them); rint is half-even.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE hypot(3.0, 4.0) = 5.0
  AND hypot(0.0, 0.0) = 0.0

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE log1p(0.0) = 0.0 AND expm1(0.0) = 0.0
  AND abs(log1p(1e-10) - 1e-10) < 1e-15

-- rint: round-half-even to double
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE rint(2.5) = 2.0 AND rint(3.5) = 4.0 AND rint(-2.5) = -2.0
