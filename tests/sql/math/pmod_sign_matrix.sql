-- pmod sign matrix vs truncating %: pmod adds the divisor back only
-- when the remainder is negative, so pmod(-7,3)=2 but pmod(-7,-3)=-1.
-- The ((a%b)+b)%b spelling is engine-portable and differentially
-- checked; pmod itself is Spark-only surface
-- (reference: sql-tests/expressions/math/arithmetic.sql pmod rows).

-- Config: spark.sql.ansi.enabled=false

statement
CREATE TABLE t_pm(a int, b int) USING parquet

statement
INSERT INTO t_pm VALUES (7, 3), (-7, 3), (7, -3), (-7, -3), (0, 3)

-- differential: both engines use truncating % so the canonical
-- positive-mod rewrite agrees everywhere
query
SELECT a, b, a % b AS m, ((a % b) + b) % b AS posm FROM t_pm ORDER BY a, b

-- pmod pins: equals the rewrite for positive divisors; for negative
-- divisors Spark keeps the raw remainder when it is already >= 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE pmod(-7, 3) = 2
  AND pmod(7, 3) = 1
  AND pmod(7, -3) = 1
  AND pmod(-7, -3) = -1
  AND pmod(0, 3) = 0

-- float / decimal pmod keep the input type's arithmetic
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE pmod(cast(-7.5 as double), cast(2.0 as double)) = 0.5
  AND pmod(cast(-7.5 as decimal(4,1)), cast(2.0 as decimal(4,1))) = 0.5

-- legacy mode: zero divisor -> NULL (ANSI raise is pinned in
-- arithmetic_ansi_errors.sql)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE pmod(7, 0) IS NULL
  AND pmod(cast(7.5 as double), cast(0 as double)) IS NULL
