-- conv(num, fromBase, toBase) numeral-system conversion: bases 2..36,
-- negative input wraps to unsigned 64-bit, negative TARGET base means
-- signed output, invalid digits take the longest valid prefix
-- (reference: sql-tests/expressions/math/conv semantics; Spark-only
-- surface — DuckDB has no conv).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE conv('ff', 16, 10) = '255'
  AND conv('FF', 16, 2) = '11111111'
  AND conv('z', 36, 10) = '35'
  AND conv('11', 2, 10) = '3'
  AND conv('255', 10, 16) = 'FF'

-- negative input to a POSITIVE target base: unsigned 64-bit wrap
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE conv('-1', 10, 16) = 'FFFFFFFFFFFFFFFF'
  AND conv('-255', 10, 16) = 'FFFFFFFFFFFFFF01'

-- negative TARGET base: signed representation instead of the wrap
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE conv('255', 10, -16) = 'FF'
  AND conv('-255', 10, -16) = '-FF'

-- invalid digits: longest valid prefix wins; nothing valid -> '0'
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE conv('1z', 2, 10) = '1'
  AND conv('zz', 2, 10) = '0'
  AND conv('19', 8, 10) = '1'

-- out-of-range bases (valid range 2..36) and NULLs -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE conv('1', 1, 10) IS NULL
  AND conv('1', 10, 37) IS NULL
  AND conv(NULL, 10, 2) IS NULL
