-- Spark-surface string functions without DuckDB spellings, value-
-- pinned: find_in_set, substring_index, elt, initcap, format_number,
-- bounded levenshtein, length-family units, sentences tokenizer.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE find_in_set('b', 'a,b,c') = 2
  AND find_in_set('z', 'a,b,c') = 0
  AND substring_index('a.b.c', '.', 2) = 'a.b'
  AND substring_index('a.b.c', '.', -1) = 'c'
  AND elt(2, 'a', 'b', 'c') = 'b'

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE initcap('hello wOrld') = 'Hello World'
  AND format_number(1234567.891, 2) = '1,234,567.89'
  AND format_number(0.5, 0) = '0'
  AND format_number(1.5, 0) = '2'

-- bounded levenshtein: distance capped by the threshold arg
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE levenshtein('abc', 'abd', 1) = 1
  AND levenshtein('abc', 'xyz', 1) = -1

-- length units: codepoints vs bytes vs bits
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE char_length('héllo') = 5
  AND octet_length('héllo') = 6
  AND bit_length('a') = 8

-- sentences: locale tokenizer emitting array<array<string>>
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_json(sentences('Hi there. Bye now.')) = '[["Hi","there"],["Bye","now"]]'
