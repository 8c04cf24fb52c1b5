-- initcap edge matrix (reference:
-- sql-tests/expressions/string/init_cap.sql — the reference marks it
-- expect_fallback because its native kernel diverges from Spark; here
-- the Spark-native behavior IS the contract).  Spark-only pins:
-- DuckDB v1.0 has no initcap at all.  The sharp edge: ONLY whitespace
-- starts a new word — hyphens, apostrophes, and digits do not — and
-- every non-leading letter is forced to lowercase.

-- basic: lowercases the tail of each word, whatever the input case
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE initcap('hello world') = 'Hello World'
  AND initcap('HELLO WORLD') = 'Hello World'
  AND initcap('hELLO wORLD') = 'Hello World'

-- hyphen/apostrophe are NOT word starts (probed on Spark 4.1:
-- 'Hello-world', not 'Hello-World'); digits pass through and a
-- digit-led word never capitalizes
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE initcap('hello-world') = 'Hello-world'
  AND initcap('o''neill macDONALD') = 'O''neill Macdonald'
  AND initcap('123abc') = '123abc'

-- whitespace is preserved verbatim; empty and NULL propagate
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE initcap('  spaces  ') = '  Spaces  '
  AND initcap('a  b') = 'A  B'
  AND initcap('') = ''
  AND initcap(CAST(NULL AS STRING)) IS NULL

-- non-ASCII letters case-fold like letters (Unicode-aware)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE initcap('ünïcode éé') = 'Ünïcode Éé'
