-- Trim-character-set forms: standard TRIM(BOTH/LEADING/TRAILING x
-- FROM s) is engine-portable and differentially checked; btrim and
-- the 2-arg ltrim/rtrim (whose trimStr comes FIRST in Spark — the
-- reverse of most engines) are Spark-only pins
-- (reference: sql-tests/expressions/string/string_trim.sql).

statement
CREATE TABLE t_trim(s string) USING parquet

statement
INSERT INTO t_trim VALUES ('xyhixy'), ('xxhix'), ('hi'), ('')

-- differential: standard trim syntax with a char SET (any of the
-- characters strips, not the sequence)
query
SELECT trim(BOTH 'xy' FROM s) AS b,
       trim(LEADING 'x' FROM s) AS l,
       trim(TRAILING 'x' FROM s) AS r
FROM t_trim ORDER BY s

-- btrim(str, trimStr) and the reversed-arg 2-arg ltrim
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE btrim('xxhixx', 'x') = 'hi'
  AND btrim('yxhixy', 'xy') = 'hi'
  AND btrim('hi', 'x') = 'hi'
  AND ltrim('x', 'xxhi') = 'hi'

-- multibyte trim characters strip whole codepoints, never bytes
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE btrim('ééaéé', 'é') = 'a'
  AND trim(BOTH 'é' FROM 'éaé') = 'a'

-- empty trim set strips nothing; NULL propagates
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE btrim('  hi  ', '') = '  hi  '
  AND btrim(NULL, 'x') IS NULL
  AND btrim('hi', NULL) IS NULL
