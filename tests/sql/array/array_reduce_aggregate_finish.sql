-- aggregate()/reduce() higher-order fold: 3-arg finish lambda, empty
-- array returns the zero value untouched, struct-typed accumulator
-- state, and NULL element/array propagation
-- (reference: sql-tests/expressions/array lambda coverage; reduce is
-- the 3.4+ alias of aggregate).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE aggregate(array(1,2,3), 0, (acc, x) -> acc + x) = 6
  AND reduce(array(1,2,3), 0, (acc, x) -> acc + x) = 6
  AND aggregate(array(1,2,3), 0, (acc, x) -> acc + x, acc -> acc * 10) = 60
  AND reduce(array(1,2,3), 1, (acc, x) -> acc * x, acc -> -acc) = -6

-- empty array: merge never runs, finish still applies to the zero
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE aggregate(array(), 7, (acc, x) -> acc + x) = 7
  AND aggregate(array(), 7, (acc, x) -> acc + x, acc -> acc + 1) = 8

-- struct accumulator: running (sum, count) -> mean via finish
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE aggregate(
        array(1,2,3),
        named_struct('s', 0, 'c', 0),
        (acc, x) -> named_struct('s', acc.s + x, 'c', acc.c + 1),
        acc -> acc.s / acc.c
      ) = 2.0

-- bigint zero widens the whole fold; null elements poison the sum
-- unless coalesced
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE aggregate(array(1,2,3), cast(0 as bigint), (acc, x) -> acc + x) = cast(6 as bigint)
  AND aggregate(array(1,NULL,3), 0, (acc, x) -> acc + x) IS NULL
  AND aggregate(array(1,NULL,3), 0, (acc, x) -> acc + coalesce(x, 0)) = 4
  AND aggregate(cast(NULL as array<int>), 0, (acc, x) -> acc + x) IS NULL
