-- Spark's extra trig/constant surface (csc, sec, e(), positive/
-- negative) — java.lang.Math-backed, no DuckDB spelling.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE abs(csc(1.0) * sin(1.0) - 1.0) < 1e-12
  AND abs(sec(1.0) * cos(1.0) - 1.0) < 1e-12
  AND abs(cot(1.0) * tan(1.0) - 1.0) < 1e-12

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE abs(e() - 2.718281828459045) < 1e-15
  AND abs(pi() - 3.141592653589793) < 1e-15

-- positive() is identity (NOT abs); negative() negates
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE positive(-3) = -3 AND negative(3) = -3 AND negative(-3) = 3
