-- Array-kernel edges where Spark and DuckDB DISAGREE (probed round 9
-- alongside fuzz family 23, which deliberately restricts itself to
-- the convergent subset — transform/filter/slice/size/min/max/join).
-- Each pin asserts the SPARK convention with the DuckDB counterpart
-- in the comment, so either engine changing its convention surfaces.
-- Reference analog: the reference documents exactly this class of
-- per-function divergence for its Rust kernels in
-- docs/source/user-guide/compatibility.md.

-- array_distinct keeps FIRST-OCCURRENCE order and ONE null.
-- DuckDB list_distinct returns ['a','b'] (order not preserved) and
-- drops nulls entirely (['b',NULL,'b',NULL] -> ['b']).
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_distinct(array('b', 'a', 'b')), ',') = 'b,a'
  AND size(array_distinct(array('b', NULL, 'b', NULL))) = 2
  AND array_join(array_distinct(array('b', NULL, 'b')), ',', 'N') = 'b,N'

-- array_contains is THREE-VALUED: searching a null-containing array
-- for an absent value is NULL (unknown), not false.  DuckDB
-- list_contains(['a',NULL],'z') returns false.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_contains(array('a', NULL), 'z') IS NULL
  AND array_contains(array('a', NULL), 'a') = true
  AND array_contains(array('a', 'b'), 'z') = false

-- sort_array places NULLS FIRST ascending / LAST descending (matches
-- Spark's ORDER BY default).  DuckDB list_sort defaults nulls LAST
-- ascending ([2,NULL,1] -> [1,2,NULL]).
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(sort_array(array(2, NULL, 1)), ',', 'N') = 'N,1,2'
  AND array_join(sort_array(array(2, NULL, 1), false), ',', 'N') = '2,1,N'

-- flatten PROPAGATES a null sub-array to a NULL result.  DuckDB
-- flatten skips it ([[1],NULL,[2]] -> [1,2]).
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE flatten(array(array(1), NULL, array(2))) IS NULL
  AND array_join(flatten(array(array(1), array(2))), ',') = '1,2'

-- convergent edges, pinned so they STAY convergent: not-found
-- array_position is 0 in both engines (not NULL); negative slice
-- start counts from the end in both; array_join/array_to_string both
-- skip nulls without a replacement argument.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_position(array('a', 'b'), 'z') = 0
  AND array_position(array('a', 'b', 'a'), 'a') = 1
  AND array_join(slice(array(1, 2, 3), -2, 2), ',') = '2,3'
  AND array_join(array('a', NULL, 'b'), ',') = 'a,b'
