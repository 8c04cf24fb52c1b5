-- bit_count width semantics.  Spark sign-extends EVERY integral
-- input to 64 bits before counting (bit_count(-1) = 64 whether the
-- argument is TINYINT, INT, or BIGINT) and accepts BOOLEAN (true ->
-- 1); DuckDB counts within the DECLARED width (tinyint -1 -> 8,
-- int -1 -> 32, bigint -1 -> 64) and has no boolean overload.
-- Non-negative inputs agree in every width (sign extension adds no
-- set bits), so those rows stay differential; negative/boolean rows
-- are Spark-only pins.  SILENT divergence — COMPAT.md Functions row.

statement
CREATE TABLE t_bc(a int, b bigint) USING parquet

statement
INSERT INTO t_bc VALUES (0, 0), (1, 1), (255, 4294967295), (1024, 9223372036854775807), (NULL, NULL)

-- differential: non-negative counts are width-independent
query
SELECT a, bit_count(a) AS ca, bit_count(b) AS cb FROM t_bc ORDER BY a NULLS FIRST

-- differential: bigint -1 is 64 set bits in both engines (declared
-- width == Spark's promoted width)
query
SELECT bit_count(CAST(-1 AS BIGINT)) AS c64

-- Spark pins: 64-bit sign extension regardless of declared width;
-- boolean input counts as one bit
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE bit_count(-1) = 64
  AND bit_count(CAST(-1 AS TINYINT)) = 64
  AND bit_count(CAST(-1 AS SMALLINT)) = 64
  AND bit_count(CAST(-2 AS INT)) = 63
  AND bit_count(true) = 1
  AND bit_count(false) = 0
