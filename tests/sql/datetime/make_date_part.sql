statement
CREATE TABLE t_md(y int, m int, d int) USING parquet

statement
INSERT INTO t_md VALUES (2020, 2, 29), (1999, 12, 31), (2026, 8, 14)

query
SELECT make_date(y, m, d) AS dt, date_part('year', make_date(y, m, d)) AS yy, date_part('doy', make_date(y, m, d)) AS doy FROM t_md ORDER BY y
