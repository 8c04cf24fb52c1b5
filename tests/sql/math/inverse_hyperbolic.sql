-- acosh/asinh/atanh (reference: sql-tests/expressions/math/acosh.sql,
-- asinh.sql, atanh.sql).  DuckDB ships none of the three — the whole
-- family is Spark-only pins (java StrictMath identities).

-- acosh: domain [1, inf); below 1 → NaN; acosh(1) = +0.0 exactly
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE acosh(1.0) = 0.0
  AND abs(acosh(2.0) - 1.3169578969248166) < 1e-15
  AND isnan(acosh(0.5)) AND isnan(acosh(-1.0))
  AND acosh(CAST('Infinity' AS DOUBLE)) = CAST('Infinity' AS DOUBLE)
  AND acosh(NULL) IS NULL

-- asinh: mathematically odd, but Spark's log-formula implementation
-- (ln(x + sqrt(x^2+1))) is NOT bit-symmetric: asinh(2.5) =
-- 1.6472311463710958 while -asinh(-2.5) = 1.6472311463710965 — a
-- 7-ulp asymmetry worth pinning (a kernel rewrite that silently
-- changes it shows up here)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE asinh(0.0) = 0.0
  AND abs(asinh(-2.5) + 1.6472311463710965) < 1e-15
  AND asinh(2.5) = 1.6472311463710958
  AND asinh(2.5) <> -asinh(-2.5)
  AND abs(asinh(2.5) + asinh(-2.5)) < 1e-14
  AND asinh(NULL) IS NULL

-- atanh: open domain (-1,1); the closed endpoints diverge to ±Inf;
-- beyond them → NaN
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE atanh(0.0) = 0.0
  AND abs(atanh(0.5) - 0.5493061443340549) < 1e-15
  AND atanh(1.0) = CAST('Infinity' AS DOUBLE)
  AND atanh(-1.0) = CAST('-Infinity' AS DOUBLE)
  AND isnan(atanh(2.0)) AND isnan(atanh(-1.5))
  AND atanh(NULL) IS NULL
