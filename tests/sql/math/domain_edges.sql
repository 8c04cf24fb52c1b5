-- Math domain edges.  DIVERGENCE (documented): sqrt(-1) and log(0)
-- RAISE in DuckDB; in Spark sqrt(-1) is NaN (IEEE) while log of a
-- non-positive argument is NULL (Spark guards the domain instead of
-- returning -Infinity) — Spark behavior pinned.  Overflow-to-infinity
-- agrees.

query
SELECT exp(710.0) AS e_inf, 1e308 * 10 AS prod_inf

query
SELECT power(0, 0) AS p00, atan2(0.0, 1.0) AS a01

-- expect-rows: 1
query spark_only
SELECT sqrt(-1.0) AS q WHERE isnan(sqrt(-1.0))

-- expect-rows: 1
query spark_only
SELECT log(0.0) AS lg WHERE log(0.0) IS NULL AND log(-1.0) IS NULL

-- expect-rows: 1
query spark_only
SELECT atan2(0.0, 0.0) AS a00 WHERE atan2(0.0, 0.0) = 0.0

-- asin/acos outside [-1,1]: NaN in Spark
-- expect-rows: 1
query spark_only
SELECT asin(2.0) AS s2 WHERE isnan(asin(2.0)) AND isnan(acos(-2.0))
