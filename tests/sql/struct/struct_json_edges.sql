-- JSON <-> struct edge matrix: from_json / to_json round trips
-- (reference: .../expressions/struct/json_to_structs.sql,
-- structs_to_json.sql).  The sharp edges: malformed JSON -> NULL
-- struct (PERMISSIVE default), missing fields -> NULL leaves, extra
-- fields ignored, type coercion on parse, and nested schemas.

-- well-formed parse, field extraction
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('{"a": 1, "b": "x"}', 'a INT, b STRING').a = 1
  AND from_json('{"a": 1, "b": "x"}', 'a INT, b STRING').b = 'x'

-- missing field -> NULL leaf; extra field silently ignored
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('{"a": 1}', 'a INT, b STRING').b IS NULL
  AND from_json('{"a": 1, "zzz": 9}', 'a INT').a = 1

-- malformed input (PERMISSIVE default): NOT a NULL struct — an
-- all-null-fields struct (so downstream field access never errors
-- and to_json gives '{}'); only a NULL INPUT gives a NULL struct
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('not json', 'a INT') IS NOT NULL
  AND from_json('not json', 'a INT').a IS NULL
  AND to_json(from_json('not json', 'a INT, b INT')) = '{}'
  AND from_json('{"a": "notanint"}', 'a INT').a IS NULL
  AND from_json(CAST(NULL AS STRING), 'a INT') IS NULL

-- JSON null vs absent field: both become NULL leaves
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('{"a": null, "b": 2}', 'a INT, b INT').a IS NULL
  AND from_json('{"a": null, "b": 2}', 'a INT, b INT').b = 2

-- nested schemas: struct-in-struct and arrays of structs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('{"o": {"x": 7}}', 'o STRUCT<x: INT>').o.x = 7
  AND from_json('{"xs": [{"v": 1}, {"v": 2}]}',
                'xs ARRAY<STRUCT<v: INT>>').xs[1].v = 2
  AND size(from_json('[1, 2, 3]', 'ARRAY<INT>')) = 3

-- round trip: to_json(from_json(s)) normalizes whitespace and key
-- order is schema order
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(from_json('{ "b" : "y" , "a" : 2 }', 'a INT, b STRING'))
      = '{"a":2,"b":"y"}'
  AND to_json(from_json('{"a": 1}', 'a INT, b STRING')) = '{"a":1}'

-- get_json_object / json_tuple: path misses are NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE get_json_object('{"a": {"b": 5}}', '$.a.b') = '5'
  AND get_json_object('{"a": 1}', '$.zzz') IS NULL
  AND get_json_object('{"xs": [10, 20]}', '$.xs[1]') = '20'
