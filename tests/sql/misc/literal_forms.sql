-- Numeric literal grammar: scientific notation, bare-dot decimals,
-- computed LIMIT, constant ORDER BY keys are shared.  Typed-suffix
-- literals (2L, 3S, 4Y, 5.0D, X'1F') are Spark grammar; DuckDB has
-- neither suffixes nor 0x... (and Spark's hex literal is X'..',
-- which is a BINARY literal, not a number).

query
SELECT 1e3 AS sci, 1.5e-2 AS sci_neg, .5 AS dot_lit

query
SELECT x FROM (VALUES (1), (2), (3)) t(x) ORDER BY x LIMIT 1 + 1

query
SELECT x FROM (VALUES (2), (1)) t(x) ORDER BY NULL, x

-- expect-rows: 1
query spark_only
SELECT 2L AS lng, 3S AS shrt, 4Y AS tiny, 5.0D AS dbl WHERE 2L = 2 AND 3S = 3 AND 4Y = 4 AND 5.0D = 5.0

-- expect-rows: 1
query spark_only
SELECT hex(X'1F2A') AS hx WHERE hex(X'1F2A') = '1F2A'
