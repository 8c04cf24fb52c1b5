-- array_union / array_intersect / array_except / array_distinct /
-- arrays_overlap edge matrix (reference: .../expressions/array/
-- array_union.sql, array_intersect.sql, array_except.sql,
-- array_distinct.sql, arrays_overlap.sql).  The sharp edges: NULL is
-- null-safe-EQUAL to NULL inside set ops, NaN equals NaN, results
-- keep first-occurrence order, and a NULL input poisons the whole op.

-- duplicates collapse; first-occurrence order is preserved
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_union(array(3, 1, 3), array(1, 2)), ',') = '3,1,2'
  AND array_join(array_intersect(array(3, 1, 2, 1), array(1, 3)), ',') = '3,1'
  AND array_join(array_except(array(3, 1, 2, 3), array(1)), ',') = '3,2'
  AND array_join(array_distinct(array(2, 1, 2, 3, 1)), ',') = '2,1,3'

-- NULL elements are null-safe-equal INSIDE set ops: union dedupes
-- them, intersect matches them, except removes them
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_union(array(1, NULL), array(NULL, 2)), ',', 'N')
      = '1,N,2'
  AND array_join(array_intersect(array(1, NULL, 2), array(NULL, 1)),
                 ',', 'N') = '1,N'
  AND array_join(array_except(array(1, NULL, 2), array(NULL)), ',', 'N')
      = '1,2'
  AND array_join(array_distinct(array(NULL, 1, NULL, 1)), ',', 'N') = 'N,1'

-- empty-array identities
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_union(array(), array(1, 1)), ',') = '1'
  AND size(array_intersect(array(1, 2), array())) = 0
  AND array_join(array_except(array(1, 2), array()), ',') = '1,2'
  AND size(array_except(array(), array(1))) = 0
  AND size(array_distinct(array())) = 0

-- NULL array input -> NULL result (all four ops)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_union(CAST(NULL AS ARRAY<INT>), array(1)) IS NULL
  AND array_intersect(array(1), CAST(NULL AS ARRAY<INT>)) IS NULL
  AND array_except(CAST(NULL AS ARRAY<INT>), array(1)) IS NULL
  AND array_distinct(CAST(NULL AS ARRAY<INT>)) IS NULL

-- arrays_overlap three-valued logic: TRUE on a common non-null
-- element; if no common element but either side has a NULL, the
-- answer is unknown -> NULL; plain FALSE only when both null-free
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE arrays_overlap(array(1, 2), array(2, 9)) = true
  AND arrays_overlap(array(1, 2), array(8, 9)) = false
  AND arrays_overlap(array(1, NULL), array(8, 9)) IS NULL
  AND arrays_overlap(array(1, 2), array(NULL, 9)) IS NULL
  AND arrays_overlap(array(1, NULL), array(1, 9)) = true
  AND arrays_overlap(array(), array(1)) = false

-- NaN is EQUAL to NaN in set-op membership: Spark's total order on
-- doubles places NaN equal to itself and greater than any other
-- value, so intersect/distinct/contains all treat NaN as one value
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(array_intersect(array(CAST('NaN' AS DOUBLE), 1.0d),
                           array(CAST('NaN' AS DOUBLE)))) = 1
  AND array_contains(array(CAST('NaN' AS DOUBLE)),
                     CAST('NaN' AS DOUBLE)) = true
  AND size(array_distinct(array(CAST('NaN' AS DOUBLE),
                                CAST('NaN' AS DOUBLE)))) = 1
