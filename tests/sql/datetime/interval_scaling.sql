-- Interval scaling and comparison: interval * int, interval / int,
-- interval ordering, timestamp difference as an interval, :: cast
-- operator.  DIVERGENCE (documented): interval-to-string rendering —
-- Spark prints the literal form ("INTERVAL '90' MINUTE"), DuckDB
-- prints clock notation ('01:30:00').  EXTRACT(EPOCH) is not a valid
-- Spark field (unix_timestamp() is the spelling) — pinned as a
-- rejection in COMPAT terms by using the portable form only.

query
SELECT INTERVAL '2' DAY * 3 AS mul, INTERVAL '10' HOUR / 2 AS div

query
SELECT INTERVAL '1' DAY > INTERVAL '23' HOUR AS day_gt_23h, INTERVAL '60' MINUTE = INTERVAL '1' HOUR AS hour_eq

query
SELECT TIMESTAMP '2020-03-05 00:00:00' - TIMESTAMP '2020-03-01 12:00:00' AS tdiff

query
SELECT '2020-03-05'::DATE AS colon_cast, '42'::INT AS colon_int

-- expect-rows: 1
query spark_only
SELECT CAST(INTERVAL '90' MINUTE AS STRING) AS istr WHERE CAST(INTERVAL '90' MINUTE AS STRING) = "INTERVAL '90' MINUTE"

-- compound interval qualifiers (DAY TO SECOND / HOUR TO MINUTE) are
-- Spark grammar; DuckDB only accepts single-unit INTERVAL literals
-- expect-rows: 1
query spark_only
SELECT TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '1 02:03:04' DAY TO SECOND AS shifted WHERE TIMESTAMP '2020-01-01 00:00:00' + INTERVAL '1 02:03:04' DAY TO SECOND = TIMESTAMP '2020-01-02 02:03:04'

-- boolean casts to numerics are shared and exact
query
SELECT CAST(true AS INT) AS b2i, CAST(false AS DOUBLE) AS b2d, CAST(1 AS BOOLEAN) AS i2b
