-- Decimal division result-type and rounding rules: Spark derives
-- decimal(23,13) from (10,2)/(10,2) (precision p1-s1+s2+max(6,s1+p2+1),
-- scale max(6,s1+p2+1)) and rounds HALF_UP at the result scale; the
-- raw quotient is NOT portable (DuckDB returns DOUBLE for the same
-- expression) so rule pins are Spark-only and the differential block
-- uses exactly-representable quotients
-- (reference: sql-tests/expressions/decimal/{decimal_div,
-- decimal_div_ansi}.sql).

statement
CREATE TABLE t_ddiv(a decimal(10,2), b decimal(10,2)) USING parquet

statement
INSERT INTO t_ddiv VALUES (1.00, 4.00), (9.00, 2.25), (-7.50, 2.50), (1.00, 8.00)

-- differential: exactly-representable quotients agree after a DOUBLE
-- cast on both engines
query
SELECT a, b, CAST(a / b AS DOUBLE) AS q FROM t_ddiv ORDER BY a, b

-- result TYPE and 13-digit HALF_UP rounding are Spark rules
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE typeof(cast(1.00 as decimal(10,2)) / cast(3.00 as decimal(10,2))) = 'decimal(23,13)'
  AND cast(1.00 as decimal(10,2)) / cast(3.00 as decimal(10,2))
        = cast(0.3333333333333 as decimal(23,13))
  AND cast(2.00 as decimal(10,2)) / cast(3.00 as decimal(10,2))
        = cast(0.6666666666667 as decimal(23,13))

-- divide by zero: ANSI raises, try_divide NULLs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_divide(cast(1.00 as decimal(10,2)), cast(0 as decimal(10,2))) IS NULL
  AND try_divide(cast(1.00 as decimal(10,2)), cast(NULL as decimal(10,2))) IS NULL

query expect_error=DIVIDE_BY_ZERO
SELECT cast(1.00 as decimal(10,2)) / cast(0 as decimal(10,2))
