-- IF() and the null-safe equality family: the standard
-- IS [NOT] DISTINCT FROM spelling is engine-portable (differential);
-- Spark's <=> operator and nvl2 are Spark-only pins
-- (reference: sql-tests/expressions/conditional/{if_expr,predicates}.sql).

statement
CREATE TABLE t_nse(a int, b int) USING parquet

statement
INSERT INTO t_nse VALUES (1, 1), (1, 2), (1, NULL), (NULL, NULL)

-- differential: IF + null-safe predicate truth table
query
SELECT a, b,
       IF(a = b, 'eq', 'ne') AS if_eq,
       a IS NOT DISTINCT FROM b AS nse,
       a IS DISTINCT FROM b AS nsd
FROM t_nse ORDER BY a NULLS FIRST, b NULLS FIRST

-- IF with a NULL predicate takes the ELSE branch (three-valued logic
-- collapses to false)
query
SELECT IF(NULL, 'y', 'n') AS null_pred,
       IF(1 < 2, 'y', 'n') AS true_pred,
       IF(2 < 1, 'y', 'n') AS false_pred

-- Spark spellings of the same semantics: <=> equals
-- IS NOT DISTINCT FROM on every row of the matrix, and nvl2 is the
-- two-way null dispatch
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE (cast(NULL as int) <=> cast(NULL as int)) = true
  AND (1 <=> cast(NULL as int)) = false
  AND (1 <=> 1) = true
  AND nvl2(NULL, 'a', 'b') = 'b'
  AND nvl2(1, 'a', 'b') = 'a'

-- <=> agrees with the standard spelling over the whole table
-- expect-rows: 0
query spark_only
SELECT a, b FROM t_nse
WHERE (a <=> b) != (a IS NOT DISTINCT FROM b)
