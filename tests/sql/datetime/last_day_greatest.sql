statement
CREATE TABLE t_ld(dt date) USING parquet

statement
INSERT INTO t_ld VALUES (DATE '2020-02-05'), (DATE '2021-02-05'), (DATE '2020-12-31'), (NULL)

query
SELECT last_day(dt) AS ld, greatest(dt, DATE '2020-06-01') AS g, least(dt, DATE '2020-06-01') AS l FROM t_ld WHERE dt IS NOT NULL ORDER BY dt
