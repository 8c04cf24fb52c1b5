-- slice(arr, start, length): 1-based start, negative start counts
-- from the end, overruns clamp, start=0 and negative length RAISE
-- (reference: sql-tests/expressions/array slice coverage).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE slice(array(1,2,3,4,5), 2, 2) = array(2,3)
  AND slice(array(1,2,3,4,5), 1, 5) = array(1,2,3,4,5)
  AND slice(array(1,2,3), 1, 0) = array()
  AND slice(array(1,2,3), 2, 99) = array(2,3)

-- negative start: -1 is the LAST element
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE slice(array(1,2,3,4,5), -2, 2) = array(4,5)
  AND slice(array(1,2,3,4,5), -5, 2) = array(1,2)
  AND slice(array(1,2,3), -99, 2) = array()

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE slice(cast(NULL as array<int>), 1, 1) IS NULL
  AND slice(array(1,2), cast(NULL as int), 1) IS NULL
  AND slice(array(1,2), 1, cast(NULL as int)) IS NULL

-- SQL arrays are 1-based: start=0 is a parameter error, not empty
query expect_error=INVALID_PARAMETER_VALUE
SELECT slice(array(1,2,3), 0, 1)

query expect_error=INVALID_PARAMETER_VALUE
SELECT slice(array(1,2,3), 1, -1)
