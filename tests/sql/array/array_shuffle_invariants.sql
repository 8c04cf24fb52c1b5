-- shuffle(arr[, seed]) is NONDETERMINISTIC across partitions (the
-- seed is combined with the partition index at init), so the corpus
-- pins only permutation INVARIANTS — multiset equality, size, null
-- passthrough — never a concrete element order
-- (reference: sql-tests/expressions/array shuffle coverage; same
-- partition-sensitivity class as rand(), pinned in
-- queries/expressions.py's nondeterministic rows).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sort_array(shuffle(array(3,1,2))) = array(1,2,3)
  AND size(shuffle(array(1,2,3,4,5))) = 5
  AND shuffle(array()) = array()
  AND shuffle(cast(NULL as array<int>)) IS NULL

-- seeded form: same seed in the same task -> same permutation, and
-- the multiset is always preserved
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE shuffle(array(1,2,3,4,5), 42) = shuffle(array(1,2,3,4,5), 42)
  AND sort_array(shuffle(array(1,2,3,4,5), 42)) = array(1,2,3,4,5)

-- duplicates and nulls survive the permutation as a multiset
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE sort_array(shuffle(array(2,2,NULL,1))) = sort_array(array(2,2,NULL,1))
  AND size(shuffle(array(NULL, NULL))) = 2
