-- asin/acos over the closed domain and beyond (reference:
-- sql-tests/expressions/math/asin.sql, acos.sql — their edge tables
-- carry out-of-domain and null rows).  Inside [-1,1] both engines
-- agree; outside, Spark returns NaN (java Math.asin) while DuckDB
-- RAISES ("undefined outside [-1,1]") — Spark-only pins.

statement
CREATE TABLE t_asin(x double) USING parquet

statement
INSERT INTO t_asin VALUES (-1.0), (-0.5), (0.0), (0.5), (1.0), (NULL)

query tolerance=1e-12
SELECT x, asin(x) AS a, acos(x) AS c FROM t_asin ORDER BY x NULLS FIRST

-- out-of-domain → NaN, never an error (legacy AND ansi mode)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(asin(1.5)) AND isnan(asin(-2.0))
  AND isnan(acos(2.0)) AND isnan(acos(-1.0000001))
  AND isnan(asin(CAST('NaN' AS DOUBLE)))
  AND isnan(acos(CAST('Infinity' AS DOUBLE)))

-- exact endpoints: asin(1) = pi/2, acos(-1) = pi, acos(1) = +0.0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE asin(1.0) = pi() / 2 AND acos(-1.0) = pi()
  AND CAST(acos(1.0) AS STRING) = '0.0'
