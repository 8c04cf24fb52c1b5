-- atan over the full line; atan2 over all four quadrants and the
-- signed-zero / infinity axes (reference:
-- sql-tests/expressions/math/atan.sql, atan2.sql).

statement
CREATE TABLE t_atan(y double, x double) USING parquet

statement
INSERT INTO t_atan VALUES
  (1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0),
  (0.0, 1.0), (1.0, 0.0), (-1.0, 0.0), (0.0, -1.0),
  (NULL, 1.0), (1.0, NULL)

query tolerance=1e-12
SELECT y, x, atan2(y, x) AS a FROM t_atan ORDER BY y NULLS FIRST, x NULLS FIRST

query tolerance=1e-12
SELECT atan(0.0) AS a0, atan(1.0) AS a1, atan(-1.0) AS am1,
       atan(CAST('Infinity' AS DOUBLE)) AS ainf,
       atan(CAST('-Infinity' AS DOUBLE)) AS aminf

-- infinity/infinity quadrant convention (java Math.atan2): pi/4 exact
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE atan2(CAST('Infinity' AS DOUBLE), CAST('Infinity' AS DOUBLE)) = pi() / 4
  AND atan2(CAST('Infinity' AS DOUBLE), CAST('-Infinity' AS DOUBLE)) = 3 * pi() / 4
  AND atan2(CAST('-Infinity' AS DOUBLE), CAST('-Infinity' AS DOUBLE)) = -3 * pi() / 4
  AND atan2(0.0, 0.0) = 0.0
  AND isnan(atan2(CAST('NaN' AS DOUBLE), 1.0))
