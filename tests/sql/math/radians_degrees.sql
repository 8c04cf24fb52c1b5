-- radians/degrees round trips and exactness (reference:
-- sql-tests/expressions/math/radians.sql, degrees.sql).

statement
CREATE TABLE t_rad(x double) USING parquet

statement
INSERT INTO t_rad VALUES (0.0), (30.0), (45.0), (90.0), (180.0), (360.0), (-90.0), (NULL)

query tolerance=1e-12
SELECT x, radians(x) AS r, degrees(radians(x)) AS roundtrip FROM t_rad
ORDER BY x NULLS FIRST

query tolerance=1e-12
SELECT degrees(pi()) AS half_turn, radians(180.0) - pi() AS zero_err

-- non-finite propagation (DuckDB radians(inf) raises)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE radians(CAST('Infinity' AS DOUBLE)) = CAST('Infinity' AS DOUBLE)
  AND degrees(CAST('-Infinity' AS DOUBLE)) = CAST('-Infinity' AS DOUBLE)
  AND isnan(radians(CAST('NaN' AS DOUBLE)))
