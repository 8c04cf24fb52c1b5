statement
CREATE TABLE t_sumf(f float, d double) USING parquet

statement
INSERT INTO t_sumf VALUES (1.5, 1.5), (2.5, 2.5), (NULL, NULL), (cast('Infinity' as float), cast('Infinity' as double))

query tolerance=1e-6
SELECT sum(f) AS sf, sum(d) AS sd FROM t_sumf

query tolerance=1e-6
SELECT sum(d) AS s FROM t_sumf WHERE d < 10
