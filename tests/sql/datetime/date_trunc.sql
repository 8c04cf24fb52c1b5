statement
CREATE TABLE t_dtr(ts timestamp) USING parquet

statement
INSERT INTO t_dtr VALUES (TIMESTAMP '2026-08-14 13:45:59.123456'), (TIMESTAMP '1969-12-31 23:59:59'), (NULL)

query
SELECT cast(date_trunc('year', ts) AS date) AS y, cast(date_trunc('month', ts) AS date) AS mo, cast(date_trunc('day', ts) AS date) AS d, cast(date_trunc('hour', ts) AS timestamp) AS h FROM t_dtr ORDER BY ts NULLS FIRST
