-- array_join on EMPTY arrays (found by fuzz family 23, round 9):
-- Spark array_join(array(), sep) returns '' (join of zero elements),
-- while DuckDB's equivalent array_to_string([], sep) returns NULL
-- (the string_agg-of-zero-rows convention).  The fuzz oracle bridges
-- with coalesce(.., ''); this file pins the Spark side so a engine
-- change in either convention surfaces.  Reference analog: the
-- array-kernel compat table in docs/source/user-guide/compatibility.md.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array(), ',') = ''
  AND array_join(slice(array('a'), 2, 1), ',') = ''
  AND array_join(filter(array('a'), x -> length(x) > 5), ',') = ''
  AND array_join(CAST(NULL AS ARRAY<STRING>), ',') IS NULL

-- the null_replacement argument does not change the empty-array case
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array(), ',', 'N') = ''
  AND array_join(array(CAST(NULL AS STRING)), ',', 'N') = 'N'
  AND array_join(array(CAST(NULL AS STRING)), ',') = ''
