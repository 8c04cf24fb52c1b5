-- Spark's JSON expression surface (get_json_object / json_tuple /
-- from_json / to_json / json_array_length / schema_of_json).  DuckDB
-- spells all of these differently (json_extract etc.), so each is
-- value-pinned spark_only.

-- expect-rows: 1
query spark_only
SELECT get_json_object('{"a": {"b": 7}, "c": [1,2,3]}', '$.a.b') AS ab WHERE get_json_object('{"a": {"b": 7}, "c": [1,2,3]}', '$.a.b') = '7'

-- expect-rows: 1
query spark_only
SELECT get_json_object('{"c": [1,2,3]}', '$.c[1]') AS c1 WHERE get_json_object('{"c": [1,2,3]}', '$.c[1]') = '2'

-- expect-rows: 1
query spark_only
SELECT json_array_length('[1, 2, [3, 4]]') AS l WHERE json_array_length('[1, 2, [3, 4]]') = 3

-- expect-rows: 1
query spark_only
SELECT from_json('{"x": 5, "y": "z"}', 'x INT, y STRING').x AS x WHERE from_json('{"x": 5, "y": "z"}', 'x INT, y STRING').x = 5

-- expect-rows: 1
query spark_only
SELECT to_json(named_struct('a', 1, 'b', 'two')) AS j WHERE to_json(named_struct('a', 1, 'b', 'two')) = '{"a":1,"b":"two"}'

-- expect-rows: 1
query spark_only
SELECT schema_of_json('{"n": 1, "s": "x"}') AS sch WHERE schema_of_json('{"n": 1, "s": "x"}') = 'STRUCT<n: BIGINT, s: STRING>'

-- malformed input is NULL, not an error
-- expect-rows: 1
query spark_only
SELECT get_json_object('not json', '$.a') AS bad WHERE get_json_object('not json', '$.a') IS NULL
