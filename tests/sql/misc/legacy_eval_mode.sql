-- Config: spark.sql.ansi.enabled=false
-- LEGACY evaluation mode (the reference's default eval-mode target:
-- its kernels implement LEGACY/ANSI/TRY per expression).  Under
-- LEGACY, Spark silently absorbs the errors ANSI raises: /0 is NULL,
-- integer overflow wraps two's-complement, narrowing casts truncate
-- bits, out-of-bounds element_at is NULL.  DuckDB raises on all of
-- these regardless, so each block is a spark_only value pin.  ANSI-mode
-- counterparts live in tests/test_cast_pairs.py and the fixture edge
-- tables.

-- expect-rows: 1
query spark_only
SELECT 1/0 AS div0 WHERE 1/0 IS NULL

-- expect-rows: 1
query spark_only
SELECT 2147483647 + 1 AS wrap WHERE 2147483647 + 1 = -2147483648

-- expect-rows: 1
query spark_only
SELECT 127Y + 1Y AS tiny_wrap WHERE 127Y + 1Y = -128Y

-- bit-truncating narrow: 300 = 0x12C -> 0x2C = 44
-- expect-rows: 1
query spark_only
SELECT CAST(300 AS tinyint) AS narrowed WHERE CAST(300 AS tinyint) = 44Y

-- expect-rows: 1
query spark_only
SELECT element_at(array(1, 2), 5) AS oob WHERE element_at(array(1, 2), 5) IS NULL
