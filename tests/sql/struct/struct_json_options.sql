-- to_json/from_json OPTIONS: timestampFormat/dateFormat override the
-- rendering/parsing patterns, ignoreNullFields=false keeps nulls in
-- the output, and malformed input degrades to null FIELDS (PERMISSIVE
-- default), never a null-row error
-- (reference: sql-tests/expressions/struct/{structs_to_json,
-- json_to_structs}.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(named_struct('t', timestamp'2024-01-02 03:04:05'),
        map('timestampFormat', 'yyyy/MM/dd HH:mm')) = '{"t":"2024/01/02 03:04"}'
  AND from_json('{"d":"02/01/2024"}', 'd date', map('dateFormat', 'dd/MM/yyyy')).d
        = date'2024-01-02'

-- null-field rendering: dropped by default, kept on request
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(named_struct('a', cast(NULL as int), 'b', 1)) = '{"b":1}'
  AND to_json(named_struct('a', cast(NULL as int), 'b', 1),
        map('ignoreNullFields', 'false')) = '{"a":null,"b":1}'

-- PERMISSIVE parsing: malformed document or field -> null FIELD,
-- the struct row itself survives
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json('{bad json', 'a int').a IS NULL
  AND from_json('{"a": "xx"}', 'a int').a IS NULL
  AND from_json('{"a": 1, "b": "x"}', 'a int, b string').a = 1

-- round-trip with options applied on both legs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE from_json(
        to_json(named_struct('t', timestamp'2024-01-02 03:04:00'),
                map('timestampFormat', 'yyyy/MM/dd HH:mm')),
        't timestamp', map('timestampFormat', 'yyyy/MM/dd HH:mm')).t
      = timestamp'2024-01-02 03:04:00'

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(cast(NULL as struct<a:int>)) IS NULL
  AND from_json(cast(NULL as string), 'a int') IS NULL
