-- Spark's collection/lambda expression surface in SQL form (arrays,
-- maps, higher-order functions).  DuckDB's list grammar differs
-- ([..] literals, list_* names), so these are value-pinned spark_only;
-- the full function-by-function coverage lives in the registry tests
-- (tests/test_functions_registry.py, 291 evaluated entries).

-- expect-rows: 1
query spark_only
SELECT array_join(transform(array(1, 2, 3), x -> x * 10), ',') AS t WHERE array_join(transform(array(1, 2, 3), x -> x * 10), ',') = '10,20,30'

-- expect-rows: 1
query spark_only
SELECT array_join(filter(array(1, 2, 3, 4), x -> x % 2 = 0), ',') AS f WHERE array_join(filter(array(1, 2, 3, 4), x -> x % 2 = 0), ',') = '2,4'

-- expect-rows: 1
query spark_only
SELECT aggregate(array(1, 2, 3, 4), 0, (acc, x) -> acc + x) AS s WHERE aggregate(array(1, 2, 3, 4), 0, (acc, x) -> acc + x) = 10

-- expect-rows: 1
query spark_only
SELECT array_join(array_sort(array_distinct(array(3, 1, 3, 2))), ',') AS d WHERE array_join(array_sort(array_distinct(array(3, 1, 3, 2))), ',') = '1,2,3'

-- expect-rows: 1
query spark_only
SELECT element_at(map('a', 1, 'b', 2), 'b') AS e WHERE element_at(map('a', 1, 'b', 2), 'b') = 2

-- expect-rows: 1
query spark_only
SELECT array_join(map_keys(map_filter(map('a', 1, 'b', 2), (k, v) -> v > 1)), ',') AS mk WHERE array_join(map_keys(map_filter(map('a', 1, 'b', 2), (k, v) -> v > 1)), ',') = 'b'

-- expect-rows: 1
query spark_only
SELECT array_join(zip_with(array(1, 2), array(10, 20), (a, b) -> a + b), ',') AS z WHERE array_join(zip_with(array(1, 2), array(10, 20), (a, b) -> a + b), ',') = '11,22'

-- expect-rows: 1
query spark_only
SELECT array_join(flatten(array(array(1), array(2, 3))), ',') AS fl, array_join(slice(sequence(1, 10), 3, 2), ',') AS sl WHERE array_join(flatten(array(array(1), array(2, 3))), ',') = '1,2,3' AND array_join(slice(sequence(1, 10), 3, 2), ',') = '3,4'
