-- Normalization conventions both engines share: -0.0 and 0.0 collapse
-- to ONE group (float-key normalization before hashing — the
-- reference's shuffle-key normalization does the same), string
-- ordering is byte-lexicographic ('A' < 'a', '10' < '100' < '9'),
-- GROUPING SETS (()) is the explicit grand total, all-NULL
-- greatest/least is NULL, and nullif(NaN, NaN) is NULL (NaN equality
-- again).  sum/avg over INTERVAL is Spark-only surface.

query
SELECT x, count(*) AS n FROM (VALUES (CAST(-0.0 AS DOUBLE)), (CAST(0.0 AS DOUBLE))) t(x) GROUP BY x

query
SELECT DISTINCT CAST(-0.0 AS DOUBLE) AS z FROM (VALUES (1), (2)) t

query
SELECT x FROM (VALUES ('10'), ('9'), ('100'), ('A'), ('a')) t(x) ORDER BY x

query
SELECT count(*) AS n FROM (VALUES (1), (2)) t(x) GROUP BY GROUPING SETS (())

query
SELECT greatest(NULL, NULL) AS g, least(CAST(NULL AS INT), NULL) AS l, nullif(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE)) AS nan_nullif

-- expect-rows: 1
query spark_only
SELECT sum(x) AS s, avg(x) AS a FROM (VALUES (INTERVAL '1' DAY), (INTERVAL '3' DAY)) t(x) HAVING sum(x) = INTERVAL '4' DAY AND avg(x) = INTERVAL '2' DAY
