query
SELECT cast(date_trunc('week', dt) AS date) AS wk, cast(date_trunc('quarter', dt) AS date) AS qtr
FROM (VALUES (TIMESTAMP '2026-08-14 13:00:00'), (TIMESTAMP '2024-01-01 00:00:00'), (TIMESTAMP '1999-12-31 23:59:59')) AS t(dt)
ORDER BY dt

-- return-TYPE pin (round 8): Spark's date_trunc ALWAYS returns
-- TIMESTAMP — even truncating a DATE to 'week' — which is why every
-- differential row above wraps it in CAST(... AS date); DuckDB's
-- date_trunc of a DATE returns DATE.  Spark's date-returning
-- spelling is trunc(date, fmt) (argument order swapped vs
-- date_trunc, and absent in DuckDB).  Silent (type) divergence —
-- COMPAT.md Functions row.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE typeof(date_trunc('week', date'2026-01-04')) = 'timestamp'
  AND typeof(trunc(date'2026-01-04', 'week')) = 'date'
  AND trunc(date'2026-01-04', 'week') = date'2025-12-29'
  AND cast(date_trunc('week', date'2026-01-04') AS date) = trunc(date'2026-01-04', 'week')
