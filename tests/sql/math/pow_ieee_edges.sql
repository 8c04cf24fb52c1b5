-- pow over the IEEE-754 special-case table (reference:
-- sql-tests/expressions/math/pow.sql).  Finite rows are differential;
-- the special cases where java Math.pow and C pow() DISAGREE are the
-- interesting pins: java pow(1.0, ±Infinity) = NaN (C returns 1.0 —
-- and so does DuckDB).

statement
CREATE TABLE t_pow(b double, e double) USING parquet

statement
INSERT INTO t_pow VALUES
  (2.0, 10.0), (2.0, -2.0), (-2.0, 3.0), (-2.0, 2.0),
  (0.0, 0.0), (10.0, 0.5), (NULL, 2.0), (2.0, NULL)

query tolerance=1e-12
SELECT b, e, pow(b, e) AS p FROM t_pow ORDER BY b NULLS FIRST, e NULLS FIRST

-- java-vs-C divergence and the NaN**0 identity
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(pow(1.0, CAST('Infinity' AS DOUBLE)))
  AND isnan(pow(1.0, CAST('-Infinity' AS DOUBLE)))
  AND pow(CAST('NaN' AS DOUBLE), 0.0) = 1.0
  AND pow(CAST('Infinity' AS DOUBLE), 0.0) = 1.0
  AND isnan(pow(-2.0, 0.5))
  AND pow(0.0, -1.0) = CAST('Infinity' AS DOUBLE)
  AND pow(0.0, CAST('Infinity' AS DOUBLE)) = 0.0
