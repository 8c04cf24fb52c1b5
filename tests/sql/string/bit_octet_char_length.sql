-- bit_length / octet_length / length / char_length / character_length
-- over ASCII, multibyte, and binary input (reference:
-- sql-tests/expressions/string/bit_length.sql, octet_length.sql,
-- length.sql).  The multibyte rows are the point: length counts
-- CHARACTERS, octet_length counts UTF-8 BYTES, bit_length = 8×octets.

-- (octet_length over a bare string literal is binder-ambiguous in
-- DuckDB, so the differential row sticks to bit_length/length)
query
SELECT bit_length('abc') AS bits, length('abc') AS chars

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE octet_length('abc') = 3

-- multibyte: 'héllo' is 5 chars / 6 bytes / 48 bits; DuckDB lacks
-- char_length/character_length and overloads bit_length differently —
-- Spark-only
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE length('héllo') = 5
  AND char_length('héllo') = 5
  AND character_length('héllo') = 5
  AND octet_length('héllo') = 6
  AND bit_length('héllo') = 48

-- binary input: counts are over raw bytes
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE bit_length(CAST('ab' AS BINARY)) = 16
  AND octet_length(CAST('ab' AS BINARY)) = 2
  AND length(CAST('ab' AS BINARY)) = 2

-- empty and NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE bit_length('') = 0 AND octet_length('') = 0 AND length('') = 0
  AND bit_length(NULL) IS NULL AND octet_length(NULL) IS NULL
