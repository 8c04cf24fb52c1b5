-- Two-argument (element, index) lambda forms of transform/filter and
-- zip_with's null-padding of the shorter side
-- (reference: sql-tests/expressions/array/array_filter.sql and
-- arrays_zip.sql lambda coverage).

-- transform (x, i): index is 0-based
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE transform(array('a','b'), (x, i) -> concat(x, i)) = array('a0', 'b1')
  AND transform(array(10, 20, 30), (x, i) -> x + i) = array(10, 21, 32)

-- filter (x, i): keep even positions
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE filter(array(10,20,30), (x, i) -> i % 2 = 0) = array(10, 30)
  AND filter(array(1,2,3,4), (x, i) -> i >= 2) = array(3, 4)

-- zip_with pads the SHORTER side with NULLs (length = max, not min)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE zip_with(array(1,2,3), array('a'),
        (x, y) -> concat(coalesce(cast(x as string), '-'), coalesce(y, '-')))
      = array('1a', '2-', '3-')
  AND size(zip_with(array(1,2), array(1,2,3,4), (x, y) -> 1)) = 4
  AND zip_with(array(), array(), (x, y) -> 1) = array()

-- index lambdas compose with nulls in the data
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE transform(array(1, NULL, 3), (x, i) -> coalesce(x, -i)) = array(1, -1, 3)
  AND filter(array(NULL, 5, NULL), (x, i) -> x IS NOT NULL) = array(5)
