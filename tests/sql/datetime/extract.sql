statement
CREATE TABLE t_ext(ts timestamp, dt date) USING parquet

statement
INSERT INTO t_ext VALUES (TIMESTAMP '2026-08-14 13:45:59', DATE '2026-08-14'), (TIMESTAMP '2000-02-29 00:00:00', DATE '2000-02-29'), (NULL, NULL)

query
SELECT extract(year FROM ts) AS y, extract(month FROM ts) AS mo, extract(day FROM ts) AS d, extract(hour FROM ts) AS h, extract(minute FROM ts) AS mi, extract(second FROM dt + INTERVAL 0 SECOND) IS NOT NULL AS ok FROM t_ext ORDER BY ts NULLS FIRST

query
SELECT year(dt) AS y, month(dt) AS mo, day(dt) AS d FROM t_ext ORDER BY dt NULLS FIRST
