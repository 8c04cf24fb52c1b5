-- Decimal edge rows: max-precision boundaries, scale-preserving
-- aggregates, negative-scale-ish rounding, sum at the precision-38
-- ceiling.  The reference's decimal kernels are its precision-
-- sensitive core; these are the rows that would catch a widened
-- accumulator.

statement
CREATE TABLE t_de(g string, v decimal(18,2)) USING parquet

statement
INSERT INTO t_de VALUES ('a', 9999999999999999.99), ('a', 0.01), ('b', -9999999999999999.99), ('b', -0.01), ('c', 0.00)

-- sum widens to (28,2): the boundary values cancel exactly
query
SELECT g, sum(v) AS s, avg(v) AS a FROM t_de GROUP BY g ORDER BY g

query
SELECT sum(v) AS total FROM t_de

-- round at decimal scale boundaries: half-up for round()
query
SELECT round(CAST(2.345 AS DECIMAL(10,3)), 2) AS r1, round(CAST(-2.345 AS DECIMAL(10,3)), 2) AS r2, round(CAST(2.5 AS DECIMAL(10,1)), 0) AS r3

-- negative round digits: to tens/hundreds
query
SELECT round(CAST(1234.5 AS DECIMAL(10,1)), -2) AS hundreds, round(CAST(1250 AS DECIMAL(10,0)), -2) AS half_hundreds

-- min/max keep the declared scale
query
SELECT min(v) AS mn, max(v) AS mx FROM t_de
