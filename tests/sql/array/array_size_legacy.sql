-- Config: spark.sql.legacy.sizeOfNull=true
-- Config: spark.sql.ansi.enabled=false
-- The historical Hive-compat size(NULL) = -1 behind the legacy flag
-- (reference: sql-tests/expressions/array/size.sql runs both
-- settings).  Kept as its own file so the per-file Config directive
-- scopes the flag flip.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(CAST(NULL AS ARRAY<INT>)) = -1
  AND cardinality(CAST(NULL AS ARRAY<INT>)) = -1
  AND size(CAST(NULL AS MAP<STRING, INT>)) = -1
  AND size(array(1, 2)) = 2
