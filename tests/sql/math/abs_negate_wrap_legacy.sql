-- abs / unary-minus at MIN_VALUE under LEGACY mode: two's-complement
-- wraparound means |MIN| == MIN — abs can return a NEGATIVE number.
-- Divergence-prone: DuckDB raises or promotes; Spark legacy wraps
-- (reference: sql-tests/expressions/math/abs.sql).

-- Config: spark.sql.ansi.enabled=false

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE abs(cast(-128 as tinyint)) = cast(-128 as tinyint)
  AND abs(cast(-32768 as smallint)) = cast(-32768 as smallint)
  AND abs(cast(-2147483648 as int)) = cast(-2147483648 as int)
  AND abs(cast(-9223372036854775808 as bigint)) = cast(-9223372036854775808 as bigint)

-- unary minus wraps the same way: -(MIN) == MIN
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE -(cast(-2147483648 as int)) = cast(-2147483648 as int)
  AND -(cast(-9223372036854775808 as bigint)) = cast(-9223372036854775808 as bigint)

-- one step inside the boundary is exact in both modes
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE abs(cast(-127 as tinyint)) = 127
  AND abs(cast(-9223372036854775807 as bigint)) = 9223372036854775807
  AND -(cast(-2147483647 as int)) = 2147483647
