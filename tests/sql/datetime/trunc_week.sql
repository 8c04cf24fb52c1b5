query
SELECT cast(date_trunc('week', dt) AS date) AS wk, cast(date_trunc('quarter', dt) AS date) AS qtr
FROM (VALUES (TIMESTAMP '2026-08-14 13:00:00'), (TIMESTAMP '2024-01-01 00:00:00'), (TIMESTAMP '1999-12-31 23:59:59')) AS t(dt)
ORDER BY dt
