-- try_* arithmetic: Spark's NULL-on-overflow family (reference
-- implements these as its TRY eval mode, CometCast/arithmetic
-- kernels).  try_cast is shared; the operators are Spark surface.

query
SELECT try_cast('12' AS int) AS ok12, try_cast('x' AS int) AS bad

-- DIVERGENCE (documented): Spark try_cast('3.9' AS int) is NULL (the
-- string grammar for int does not admit fractions); DuckDB TRY_CAST
-- rounds to 4.  Spark's behavior pinned.
-- expect-rows: 1
query spark_only
SELECT try_cast('3.9' AS int) AS frac WHERE try_cast('3.9' AS int) IS NULL

-- int overflow -> NULL, not error and not wraparound
-- expect-rows: 1
query spark_only
SELECT try_add(2147483647, 1) AS a, try_subtract(-2147483648, 1) AS b, try_multiply(2000000000, 2) AS c WHERE try_add(2147483647, 1) IS NULL AND try_subtract(-2147483648, 1) IS NULL AND try_multiply(2000000000, 2) IS NULL

-- division by zero -> NULL
-- expect-rows: 1
query spark_only
SELECT try_divide(1.0, 0) AS d WHERE try_divide(1.0, 0) IS NULL

-- non-overflowing inputs behave exactly like the plain operators
-- expect-rows: 1
query spark_only
SELECT try_add(2, 3) AS a, try_multiply(4, 5) AS m WHERE try_add(2, 3) = 5 AND try_multiply(4, 5) = 20

-- try_sum overflows to NULL where sum would raise under ANSI
-- expect-rows: 1
query spark_only
SELECT try_sum(x) AS s FROM (VALUES (9223372036854775807), (1)) t(x) HAVING try_sum(x) IS NULL
