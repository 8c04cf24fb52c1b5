-- Struct surface, mirroring the reference corpus class (reference:
-- sql-tests/expressions/struct/ — named_struct creation, field
-- access, JSON round trips).  Spark-grammar value pins.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE named_struct('a', 1, 'b', 'two').a = 1
  AND named_struct('a', 1, 'b', 'two').b = 'two'
  AND struct(1, 'x').col1 = 1

-- struct comparison is field-by-field, left to right
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE struct(1, 'b') < struct(2, 'a')
  AND struct(1, 'b') > struct(1, 'a')
  AND struct(1, 'a') = struct(1, 'a')

-- JSON round trip: structs_to_json then json_to_structs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_json(named_struct('n', 5, 's', 'x')) = '{"n":5,"s":"x"}'
  AND from_json('{"n": 5, "s": "x"}', 'n INT, s STRING').n = 5
  AND from_json('{"n": 5, "s": "x"}', 'n INT, s STRING').s = 'x'

-- nested field access
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE named_struct('outer', named_struct('inner', 42)).outer.inner = 42

-- struct ordering drives ORDER BY / GROUP BY
-- expect-rows: 2
query spark_only
SELECT s FROM (SELECT struct(x, y) AS s FROM (VALUES (2, 'b'), (1, 'z')) t(x, y)) u ORDER BY s
