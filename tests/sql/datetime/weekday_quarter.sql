statement
CREATE TABLE t_wq(dt date) USING parquet

-- dayofweek() numbering diverges between engines (Spark 1=Sunday,
-- DuckDB 0=Sunday) and is pinned Spark-side in the tpcds weekday
-- pivot query; this file sticks to the shared-definition fields
query
SELECT quarter(dt) AS q, weekofyear(dt) AS woy, month(dt) AS mo, day(dt) AS d
FROM (VALUES (DATE '2026-08-14'), (DATE '2024-01-01'), (DATE '2000-10-31')) AS t(dt)
ORDER BY dt
