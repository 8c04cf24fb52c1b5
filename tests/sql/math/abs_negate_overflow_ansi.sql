-- abs / unary-minus overflow at each integer type's MIN_VALUE under
-- ANSI mode: |MIN| is unrepresentable in two's complement, so both
-- spellings must RAISE, and the try_* family must return NULL instead
-- (reference: sql-tests/expressions/math/abs_ansi.sql).

-- Config: spark.sql.ansi.enabled=true

query expect_error=ARITHMETIC_OVERFLOW
SELECT abs(cast(-128 as tinyint))

query expect_error=ARITHMETIC_OVERFLOW
SELECT abs(cast(-32768 as smallint))

query expect_error=ARITHMETIC_OVERFLOW
SELECT abs(cast(-2147483648 as int))

query expect_error=ARITHMETIC_OVERFLOW
SELECT abs(cast(-9223372036854775808 as bigint))

query expect_error=ARITHMETIC_OVERFLOW
SELECT -(cast(-2147483648 as int))

query expect_error=ARITHMETIC_OVERFLOW
SELECT -(cast(-9223372036854775808 as bigint))

-- the try_ spelling of the same overflow returns NULL, not an error
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_subtract(0, cast(-9223372036854775808 as bigint)) IS NULL
  AND try_subtract(cast(0 as int), cast(-2147483648 as int)) IS NULL
  AND try_subtract(0, cast(-9223372036854775807 as bigint)) = 9223372036854775807

-- floating point never overflows on negation/abs: IEEE carries it
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE abs(cast('-Infinity' as double)) = cast('Infinity' as double)
  AND -(cast('-Infinity' as double)) = cast('Infinity' as double)
  AND abs(-1.7976931348623157E308) = 1.7976931348623157E308
