-- Hyperbolic family (sinh/cosh/tanh and inverses) — java.lang.Math
-- surface DuckDB lacks; forward/inverse composition pinned to 1e-12.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE abs(sinh(1.0) - 1.1752011936438014) < 1e-12
  AND abs(cosh(1.0) - 1.5430806348152437) < 1e-12
  AND abs(tanh(1.0) - 0.7615941559557649) < 1e-12

-- identities: cosh^2 - sinh^2 = 1; inverse round trips
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE abs(cosh(2.0) * cosh(2.0) - sinh(2.0) * sinh(2.0) - 1.0) < 1e-9
  AND abs(asinh(sinh(0.5)) - 0.5) < 1e-12
  AND abs(acosh(cosh(0.5)) - 0.5) < 1e-9
  AND abs(atanh(tanh(0.5)) - 0.5) < 1e-12

-- odd/even symmetry and zero points
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE sinh(0.0) = 0.0 AND tanh(0.0) = 0.0 AND cosh(0.0) = 1.0
  AND sinh(-1.0) = -sinh(1.0) AND cosh(-1.0) = cosh(1.0)
