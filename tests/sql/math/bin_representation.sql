-- bin(): two's-complement binary rendering of BIGINT (reference:
-- sql-tests/expressions/math/bin.sql).  Both engines render
-- non-negative values identically; negative input diverges in TYPE
-- SYSTEM (DuckDB bin(-13) renders a sign, Spark renders the 64-bit
-- two's complement) — Spark-only pins for the negative half.

statement
CREATE TABLE t_bin(x bigint) USING parquet

statement
INSERT INTO t_bin VALUES (0), (1), (13), (255), (9223372036854775807), (NULL)

query
SELECT x, bin(x) AS b FROM t_bin ORDER BY x NULLS FIRST

-- negative input: full 64-bit two's complement, no sign character
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE bin(-1) = repeat('1', 64)
  AND bin(-13) = '1111111111111111111111111111111111111111111111111111111111110011'
  AND bin(-9223372036854775808) = '1' || repeat('0', 63)
  AND length(bin(-42)) = 64
