-- substring_index depth: count 0 and empty delimiter give '', a
-- missing delimiter returns the WHOLE string, negative counts walk
-- from the right, multi-char delimiters match as a sequence, and
-- matching is case-sensitive
-- (reference: sql-tests/expressions/string/string.sql MySQL-family
-- rows; base pins live in misc_spark_pins.sql — this file is the
-- per-edge table).

statement
CREATE TABLE t_ssi(s string, d string, n int) USING parquet

statement
INSERT INTO t_ssi VALUES
  ('a.b.c', '.', 1), ('a.b.c', '.', 2), ('a.b.c', '.', -1),
  ('a.b.c', '.', -2), ('abc', '.', 2), ('a.b.c', '.', 0)

-- expect-rows: 6
query spark_only
SELECT s, d, n, substring_index(s, d, n) AS part FROM t_ssi ORDER BY n, s

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE substring_index('a.b.c', '.', 0) = ''
  AND substring_index('abc', '', 1) = ''
  AND substring_index('abc', '.', 2) = 'abc'
  AND substring_index('abc', '.', -2) = 'abc'

-- multi-char delimiter matches as a SEQUENCE, not a char set
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE substring_index('aXXbXXc', 'XX', -2) = 'bXXc'
  AND substring_index('aXXbXXc', 'XX', 1) = 'a'
  AND substring_index('aXbXc', 'XX', 1) = 'aXbXc'

-- case-sensitive: lowercase x does not match uppercase X
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE substring_index('aXbxc', 'x', 1) = 'aXb'
  AND substring_index('aXbxc', 'X', 1) = 'a'

-- consecutive delimiters produce empty fields that still count
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE substring_index('a..b', '.', 2) = 'a.'
  AND substring_index('..a', '.', 1) = ''
  AND substring_index(NULL, '.', 1) IS NULL
  AND substring_index('a', NULL, 1) IS NULL
