-- unhex odd-length / invalid-digit matrix (reference:
-- sql-tests/expressions/string/unhex.sql).  The sharp edge: an
-- ODD-length input is LEFT-padded with a zero nibble ('4' → 0x04,
-- '4D7' → 0x04D7) rather than rejected; any non-hex character yields
-- NULL.  Round-trip agreement with DuckDB holds for even canonical
-- input (hex_bin_encode.sql); these pins are Spark-only.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hex(unhex('4')) = '04'
  AND hex(unhex('4D7')) = '04D7'
  AND unhex('GG') IS NULL
  AND unhex('4G') IS NULL
  AND hex(unhex('')) = ''
  AND unhex(NULL) IS NULL

-- case-insensitive digits; round trip through both casings
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE unhex('4d') = unhex('4D')
  AND hex(unhex('deadBEEF')) = 'DEADBEEF'
