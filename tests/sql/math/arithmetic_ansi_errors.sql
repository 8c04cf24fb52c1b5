-- ANSI-mode arithmetic error matrix (reference:
-- sql-tests/expressions/math/arithmetic_ansi.sql, abs_ansi.sql).
-- Spark 4 defaults to ANSI; this file pins that the default RAISES on
-- integer overflow and division by zero — and that every raise has a
-- try_* escape hatch returning NULL.  expect_error blocks are
-- Spark-side only (DuckDB's error taxonomy differs; its behavior on
-- these inputs is pinned differentially in modulo_factorial_edges.sql
-- and domain_edges.sql).

-- Config: spark.sql.ansi.enabled=true

statement
CREATE TABLE ansi_edge_ints(i int, l long, s short, b tinyint, z int, zl long) USING parquet

statement
INSERT INTO ansi_edge_ints VALUES
(2147483647, 9223372036854775807, 32767, 127, 0, 0),
(-2147483648, -9223372036854775808, -32768, -128, 0, 0)

-- int addition overflow: column path and literal (constant-folded) path
query expect_error=overflow
SELECT i + 1 FROM ansi_edge_ints WHERE i = 2147483647

query expect_error=overflow
SELECT 2147483647 + 1

-- int subtraction / multiplication overflow
query expect_error=overflow
SELECT i - 1 FROM ansi_edge_ints WHERE i = -2147483648

query expect_error=overflow
SELECT i * 2 FROM ansi_edge_ints WHERE i = 2147483647

-- long add/sub/mul overflow
query expect_error=overflow
SELECT l + 1 FROM ansi_edge_ints WHERE l = 9223372036854775807

query expect_error=overflow
SELECT l - 1 FROM ansi_edge_ints WHERE l = -9223372036854775808

query expect_error=overflow
SELECT l * 2 FROM ansi_edge_ints WHERE l = 9223372036854775807

-- unary minus at the asymmetric MIN of each width
query expect_error=overflow
SELECT -i FROM ansi_edge_ints WHERE i = -2147483648

query expect_error=overflow
SELECT -l FROM ansi_edge_ints WHERE l = -9223372036854775808

-- abs at MIN overflows for every integer width (|MIN| > MAX)
query expect_error=overflow
SELECT abs(i) FROM ansi_edge_ints WHERE i = -2147483648

query expect_error=overflow
SELECT abs(l) FROM ansi_edge_ints WHERE l = -9223372036854775808

query expect_error=overflow
SELECT abs(s) FROM ansi_edge_ints WHERE s = CAST(-32768 AS SHORT)

query expect_error=overflow
SELECT abs(b) FROM ansi_edge_ints WHERE b = CAST(-128 AS TINYINT)

-- division / integral division / remainder by zero — column and
-- literal paths, int and long (4.0 says DIVIDE_BY_ZERO, 4.1 says
-- REMAINDER_BY_ZERO for %: match the common BY_ZERO substring)
query expect_error=DIVIDE_BY_ZERO
SELECT i / z FROM ansi_edge_ints

query expect_error=DIVIDE_BY_ZERO
SELECT i div z FROM ansi_edge_ints

query expect_error=BY_ZERO
SELECT i % z FROM ansi_edge_ints

query expect_error=DIVIDE_BY_ZERO
SELECT l / zl FROM ansi_edge_ints

query expect_error=BY_ZERO
SELECT pmod(l, zl) FROM ansi_edge_ints

query expect_error=DIVIDE_BY_ZERO
SELECT 1 / 0

query expect_error=DIVIDE_BY_ZERO
SELECT 1 div 0

query expect_error=BY_ZERO
SELECT 1 % 0

-- every raise above has a try_* escape returning NULL under ANSI
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_add(2147483647, 1) IS NULL
  AND try_subtract(-2147483648, 1) IS NULL
  AND try_multiply(9223372036854775807, 2) IS NULL
  AND try_divide(1, 0) IS NULL
  AND try_mod(1, 0) IS NULL

-- try_* stays exact where no overflow occurs (not a silent widen)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_add(2147483646, 1) = 2147483647
  AND try_multiply(3037000499, 3037000499) = 9223372030926249001
  AND try_mod(-7, 3) = -1

-- double OVERFLOW keeps IEEE semantics under ANSI (-> ±Infinity, no
-- raise) — but double DIVISION by zero still raises (probed on 4.1:
-- ANSI div-by-zero covers fractional types too, not just integers)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE CAST(1e308 AS DOUBLE) * 10 = CAST('Infinity' AS DOUBLE)
  AND CAST(-1e308 AS DOUBLE) * 10 = CAST('-Infinity' AS DOUBLE)
  AND exp(710.0) = CAST('Infinity' AS DOUBLE)
  AND isnan(CAST('NaN' AS DOUBLE))

query expect_error=DIVIDE_BY_ZERO
SELECT CAST(1.0 AS DOUBLE) / CAST(0.0 AS DOUBLE)

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_divide(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)) IS NULL
