-- chr / ascii codepoint edges (reference:
-- sql-tests/expressions/string/chr.sql, ascii.sql — their tables
-- carry 0, NULL, 128522, 256, negatives).  DIVERGENCE (documented,
-- Spark-only pins): Spark's chr is MOD-256 byte semantics — chr(n)
-- = chr(n % 256), chr(negative) = '' — while DuckDB's chr is a
-- Unicode codepoint constructor (chr(128522) is the emoji).  Spark's
-- ascii is nonetheless codepoint-wide on READ: it returns the full
-- codepoint of the first character, not just 0-127.

-- chr: plain ASCII, NUL, negative -> empty, NULL -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE chr(65) = 'A' AND chr(97) = 'a' AND chr(48) = '0'
  AND chr(0) = CAST(X'00' AS STRING)
  AND chr(-1) = '' AND length(chr(-1)) = 0
  AND chr(CAST(NULL AS INT)) IS NULL

-- chr mod-256 wrap: 256 -> NUL, 321 -> 'A' (321-256=65),
-- 128522 % 256 = 10 -> newline.  Probed on Spark 4.1.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE chr(256) = CAST(X'00' AS STRING)
  AND chr(321) = 'A'
  AND chr(128522) = CAST(X'0A' AS STRING)

-- ascii: first-character codepoint, multibyte included; '' -> 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE ascii('A') = 65 AND ascii('abc') = 97 AND ascii('0') = 48
  AND ascii('€') = 8364
  AND ascii('😊') = 128522
  AND ascii('') = 0
  AND ascii(CAST(NULL AS STRING)) IS NULL

-- chr∘ascii is identity exactly on the single-byte range [1, 255]
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE chr(ascii('A')) = 'A' AND chr(ascii('~')) = '~'
  AND chr(ascii('ÿ')) = 'ÿ'
  AND chr(ascii('€')) <> '€'

-- ascii agrees with DuckDB on the 7-bit range (both read the first
-- character's codepoint there)
query
SELECT ascii('A') AS a1, ascii('z') AS a2, ascii(' ') AS a3,
       ascii('0') AS a4
