-- isnan/nanvl (reference: sql-tests/expressions/math/isnan.sql;
-- nanvl appears in the reference's predicate serde,
-- spark/src/main/scala/org/apache/comet/serde/predicates.scala).
-- isnan(NULL) is FALSE in Spark (null-rejecting predicate) but NULL
-- in DuckDB; nanvl does not exist in DuckDB — Spark-only pins.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE isnan(CAST('NaN' AS DOUBLE))
  AND NOT isnan(1.0)
  AND NOT isnan(CAST('Infinity' AS DOUBLE))
  AND NOT isnan(NULL)

-- nanvl replaces ONLY NaN — infinities and nulls pass through
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE nanvl(CAST('NaN' AS DOUBLE), 5.0) = 5.0
  AND nanvl(3.0, 5.0) = 3.0
  AND nanvl(3.0, CAST('NaN' AS DOUBLE)) = 3.0
  AND isnan(nanvl(CAST('NaN' AS DOUBLE), CAST('NaN' AS DOUBLE)))
  AND nanvl(CAST('Infinity' AS DOUBLE), 0.0) = CAST('Infinity' AS DOUBLE)
  AND nanvl(NULL, 5.0) IS NULL
