-- sort_array / array_join / flatten / arrays_zip / array_min /
-- array_max edge matrix (reference: .../expressions/array/
-- sort_array.sql, array_join.sql, flatten.sql, arrays_zip.sql,
-- array_min.sql, array_max.sql).  The sharp edges: sort_array's null
-- placement flips with direction, array_join's null handling depends
-- on the optional replacement, flatten is NULL-poisoned by a null
-- INNER array, and arrays_zip null-pads to the longest input.

-- sort_array: ascending puts NULLs FIRST, descending puts them LAST
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(sort_array(array(3, NULL, 1)), ',', 'N') = 'N,1,3'
  AND array_join(sort_array(array(3, NULL, 1), false), ',', 'N') = '3,1,N'
  AND array_join(sort_array(array('b', 'a', '')), ',') = ',a,b'
  AND size(sort_array(array())) = 0
  AND sort_array(CAST(NULL AS ARRAY<INT>)) IS NULL

-- sort_array on doubles: total order — NaN sorts ABOVE Infinity
-- (a -0.0 literal is folded to 0.0 at parse time, so the -0.0-vs-0.0
-- ordering edge is untestable from literals; Spark normalizes -0.0
-- in sort keys anyway)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(sort_array(array(CAST('NaN' AS DOUBLE),
                                  CAST(1.0 AS DOUBLE),
                                  CAST('Infinity' AS DOUBLE))), ',')
      = '1.0,Infinity,NaN'
  AND array_join(sort_array(array(CAST('-Infinity' AS DOUBLE),
                                  CAST(1.0 AS DOUBLE))), ',')
      = '-Infinity,1.0'

-- array_join: 2-arg form SKIPS nulls; 3-arg form substitutes them;
-- empty array -> empty string; null array -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array('a', NULL, 'b'), ',') = 'a,b'
  AND array_join(array('a', NULL, 'b'), ',', '?') = 'a,?,b'
  AND array_join(array(NULL, NULL), ',') = ''
  AND array_join(array(), ',') = ''
  AND array_join(CAST(NULL AS ARRAY<STRING>), ',') IS NULL

-- flatten: one level only; a NULL inner array poisons the result;
-- empty inners vanish
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(flatten(array(array(1, 2), array(), array(3))), ',')
      = '1,2,3'
  AND flatten(array(array(1), CAST(NULL AS ARRAY<INT>))) IS NULL
  AND flatten(CAST(NULL AS ARRAY<ARRAY<INT>>)) IS NULL
  AND size(flatten(array(array(), array()))) = 0
  AND array_join(flatten(array(array(1, NULL), array(2))), ',', 'N')
      = '1,N,2'

-- arrays_zip: pads the SHORTER side with NULL to the longest length
-- (default to_json OMITS null fields — the padding only renders
-- under ignoreNullFields=false)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(arrays_zip(array(1, 2, 3), array('a')),
              map('ignoreNullFields', 'false'))
      = '[{"0":1,"1":"a"},{"0":2,"1":null},{"0":3,"1":null}]'
  AND to_json(arrays_zip(array(1, 2), array('a')))
      = '[{"0":1,"1":"a"},{"0":2}]'
  AND size(arrays_zip(array(), array())) = 0
  AND arrays_zip(array(1), CAST(NULL AS ARRAY<INT>)) IS NULL

-- array_min / array_max: nulls are SKIPPED (not poisoning); all-null
-- and empty arrays -> NULL; doubles use the same total order
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_min(array(3, NULL, 1)) = 1
  AND array_max(array(3, NULL, 1)) = 3
  AND array_min(array(CAST(NULL AS INT), CAST(NULL AS INT))) IS NULL
  AND array_max(array()) IS NULL
  AND array_max(array(CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE)))
      <=> CAST('NaN' AS DOUBLE)
  AND array_min(array(CAST(-0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) = -0.0
