-- get_json_object path matrix (reference:
-- sql-tests/expressions/string/get_json_object.sql).  Pins: nested
-- dotted paths, array indexing, scalar string results come UNQUOTED,
-- object/array results come as compact JSON text, JSON null / missing
-- key / malformed document / non-$-rooted path all yield SQL NULL.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE get_json_object('{"a": {"b": 2}}', '$.a.b') = '2'
  AND get_json_object('{"a": [1,2]}', '$.a[1]') = '2'
  AND get_json_object('{"a": "x"}', '$.a') = 'x'
  AND get_json_object('{"a": {"b":1}}', '$.a') = '{"b":1}'
  AND get_json_object('{"a": [1,2]}', '$.a') = '[1,2]'

-- NULL-producing paths
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE get_json_object('{"a": 1}', '$.missing') IS NULL
  AND get_json_object('not json', '$.a') IS NULL
  AND get_json_object('{"a": null}', '$.a') IS NULL
  AND get_json_object('{"a": 1}', 'a') IS NULL
  AND get_json_object(NULL, '$.a') IS NULL
  AND get_json_object('{"a": 1}', NULL) IS NULL

-- deep nesting + array-of-objects traversal
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE get_json_object('{"a":[{"b":1},{"b":2}]}', '$.a[1].b') = '2'
  AND get_json_object('{"a":{"b":{"c":[9]}}}', '$.a.b.c[0]') = '9'
