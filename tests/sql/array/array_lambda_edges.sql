-- Higher-order array functions edge matrix: transform / filter /
-- exists / forall / aggregate / zip_with / array_sort(comparator)
-- (reference: .../expressions/array/array_filter.sql plus the lambda
-- surface the reference routes to native closures).  The sharp
-- edges: lambdas SEE null elements (no implicit skip), exists/forall
-- are three-valued, aggregate threads nulls through the accumulator,
-- and zip_with null-pads the shorter input.

-- transform: element and (element, index) forms; nulls flow through
-- the lambda
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(transform(array(1, 2, 3), x -> x * 10), ',') = '10,20,30'
  AND array_join(transform(array(1, 2, 3), (x, i) -> x + i), ',') = '1,3,5'
  AND array_join(transform(array(1, NULL, 3), x -> x + 1), ',', 'N')
      = '2,N,4'
  AND size(transform(array(), x -> x)) = 0
  AND transform(CAST(NULL AS ARRAY<INT>), x -> x) IS NULL

-- filter: a NULL predicate result DROPS the element (not kept);
-- (element, index) form filters positionally
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(filter(array(1, 2, 3, 4), x -> x % 2 = 0), ',') = '2,4'
  AND array_join(filter(array(1, NULL, 3), x -> x > 0), ',') = '1,3'
  AND array_join(filter(array(1, NULL, 3), x -> x IS NULL), ',', 'N') = 'N'
  AND array_join(filter(array(10, 20, 30), (x, i) -> i > 0), ',') = '20,30'
  AND size(filter(array(), x -> true)) = 0

-- exists: TRUE beats NULL beats FALSE (three-valued OR across elements)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE exists(array(1, 2, 3), x -> x = 2) = true
  AND exists(array(1, 2, 3), x -> x = 9) = false
  AND exists(array(1, NULL, 3), x -> x = 9) IS NULL
  AND exists(array(1, NULL, 3), x -> x = 1) = true
  AND exists(array(), x -> true) = false
  AND exists(CAST(NULL AS ARRAY<INT>), x -> true) IS NULL

-- forall: FALSE beats NULL beats TRUE (three-valued AND); vacuously
-- true on empty
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE forall(array(2, 4), x -> x % 2 = 0) = true
  AND forall(array(2, 3), x -> x % 2 = 0) = false
  AND forall(array(2, NULL), x -> x % 2 = 0) IS NULL
  AND forall(array(3, NULL), x -> x % 2 = 0) = false
  AND forall(array(), x -> false) = true

-- aggregate: zero/merge/finish; a NULL element NULLs the running
-- accumulator unless the merge guards it
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x) = 6
  AND aggregate(array(1, NULL, 3), 0, (acc, x) -> acc + x) IS NULL
  AND aggregate(array(1, NULL, 3), 0,
                (acc, x) -> acc + coalesce(x, 0)) = 4
  AND aggregate(array(), 7, (acc, x) -> acc + x) = 7
  AND aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x, acc -> acc * 10)
      = 60
  AND aggregate(CAST(NULL AS ARRAY<INT>), 0, (acc, x) -> acc + x) IS NULL

-- zip_with: shorter side null-padded; lambda sees the padding nulls
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(zip_with(array(1, 2, 3), array(10, 20, 30),
                          (a, b) -> a + b), ',') = '11,22,33'
  AND array_join(zip_with(array(1, 2, 3), array(10), (a, b) -> a + b),
                 ',', 'N') = '11,N,N'
  AND array_join(zip_with(array(1, 2), array('a', 'b'),
                          (a, b) -> concat(b, a)), ',') = 'a1,b2'
  AND zip_with(array(1), CAST(NULL AS ARRAY<INT>), (a, b) -> a) IS NULL

-- array_sort with comparator: custom order (descending, nulls
-- steered last by the comparator contract)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_sort(array(2, 3, 1),
                            (l, r) -> CASE WHEN l > r THEN -1
                                           WHEN l < r THEN 1 ELSE 0 END),
                 ',') = '3,2,1'
  AND array_join(array_sort(array(2, NULL, 1)), ',', 'N') = '1,2,N'
