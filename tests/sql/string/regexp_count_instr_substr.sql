-- The regexp probe family: regexp_count, regexp_instr (1-based, 0 on
-- miss), regexp_substr (NULL on miss), regexp_extract_all with group
-- selection (reference: sql-tests/expressions/string/rlike.sql and
-- regexp_replace.sql family).

statement
CREATE TABLE t_re(s string) USING parquet

statement
INSERT INTO t_re VALUES ('a1b22c333'), ('hello'), ('no digits')

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE regexp_count('hello world', 'o') = 2
  AND regexp_count('abc', 'z') = 0
  AND regexp_count('aaa', 'aa') = 1
  AND regexp_count('', '.') = 0

-- regexp_instr: 1-based position of the first match; 0 when absent
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE regexp_instr('hello', 'l+') = 3
  AND regexp_instr('hello', 'z') = 0
  AND regexp_instr('ab12cd', '[0-9]+') = 3

-- regexp_substr: the matched text; NULL when absent
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE regexp_substr('hello', 'l+o') = 'llo'
  AND regexp_substr('hello', 'zz') IS NULL

-- regexp_extract_all: group 1 vs whole-match group 0
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE regexp_extract_all('a1b22c333', '(\\d+)', 1) = array('1', '22', '333')
  AND regexp_extract_all('a1b22', '\\d+', 0) = array('1', '22')
  AND size(regexp_extract_all('nope', '(\\d+)', 1)) = 0

-- over a column: count digit runs per row
-- expect-rows: 3
query spark_only
SELECT s, regexp_count(s, '[0-9]+') AS runs FROM t_re ORDER BY s

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE regexp_count(NULL, 'a') IS NULL
  AND regexp_instr(NULL, 'a') IS NULL
  AND regexp_substr(NULL, 'a') IS NULL
