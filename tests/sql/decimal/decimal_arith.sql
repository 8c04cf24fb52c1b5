statement
CREATE TABLE t_dec(a decimal(10,2), b decimal(10,2)) USING parquet

statement
INSERT INTO t_dec VALUES (1.25, 2.50), (-99999999.99, 0.01), (0.00, -1.00), (NULL, 5.00)

query
SELECT a + b AS s, a - b AS d, a * b AS p FROM t_dec ORDER BY a NULLS FIRST

query
SELECT sum(a) AS sa, min(a) AS mn, max(a) AS mx FROM t_dec
