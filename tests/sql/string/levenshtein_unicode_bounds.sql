-- levenshtein: ASCII distances are engine-portable (differential);
-- MULTIBYTE input diverges by design — Spark counts codepoints
-- (levenshtein('éé','ee') = 2) where byte-based engines like DuckDB
-- count bytes (= 4) — so unicode rows are Spark-only pins; the
-- 3-arg bounded form returns -1 past the threshold
-- (reference: string distance coverage in the reference's Rust string
-- kernels, native/spark-expr).

statement
CREATE TABLE t_lev(a string, b string) USING parquet

statement
INSERT INTO t_lev VALUES ('kitten', 'sitting'), ('abc', 'abc'), ('', 'abc'), ('flaw', 'lawn')

-- differential: classic ASCII distances agree across engines
query
SELECT a, b, levenshtein(a, b) AS d FROM t_lev ORDER BY a, b

-- codepoint semantics: 2 substitutions, not 4 byte edits
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE levenshtein('éé', 'ee') = 2
  AND levenshtein('é', '') = 1
  AND char_length('éé') = 2

-- bounded form: exact distance while <= threshold, else -1
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE levenshtein('kitten', 'sitting', 3) = 3
  AND levenshtein('kitten', 'sitting', 2) = -1
  AND levenshtein('a', 'a', 0) = 0
  AND levenshtein('a', 'b', -1) = -1

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE levenshtein(NULL, 'a') IS NULL
  AND levenshtein('a', NULL) IS NULL
