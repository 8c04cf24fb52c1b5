-- Map function surface, mirroring the reference corpus class
-- (reference: sql-tests/expressions/map/ — 8 files).  Spark map
-- grammar isn't shared with DuckDB, so blocks are value-pinned
-- spark_only.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE map_contains_key(map('a', 1, 'b', 2), 'a') = true
  AND map_contains_key(map('a', 1), 'z') = false
  AND element_at(map('a', 1, 'b', 2), 'b') = 2
  AND element_at(map('a', 1), 'z') IS NULL
  AND map('a', 1, 'b', 2)['a'] = 1

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE array_join(map_keys(map('a', 1, 'b', 2)), ',') = 'a,b'
  AND array_join(map_values(map('a', 1, 'b', 2)), ',') = '1,2'
  AND size(map('a', 1, 'b', 2)) = 2
  AND size(map()) = 0

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE element_at(map_from_arrays(array('x', 'y'), array(7, 8)), 'y') = 8
  AND element_at(map_from_entries(array(struct('k1', 10), struct('k2', 20))), 'k2') = 20

-- str_to_map: the config-string parser
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE element_at(str_to_map('a:1,b:2', ',', ':'), 'b') = '2'
  AND size(str_to_map('a:1,b:2', ',', ':')) = 2

-- map_entries exposes key/value structs; verify through to_json
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_json(map_entries(map('a', 1))) = '[{"key":"a","value":1}]'
