-- Spark 4 VARIANT surface (parse_json / variant_get / try_parse_json
-- / is_variant_null / schema_of_variant) and the to_char/to_number
-- numeric-format pair — superset surface the reference predates;
-- value-pinned spark_only (DuckDB's JSON type is a different model).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE variant_get(parse_json('{"a": {"b": 7}}'), '$.a.b', 'int') = 7
  AND to_json(parse_json('{"x": [1, 2]}')) = '{"x":[1,2]}'
  AND schema_of_variant(parse_json('{"n": 1}')) = 'OBJECT<n: BIGINT>'

-- malformed input: try_ form is NULL; variant JSON null is "null"
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE try_parse_json('not json') IS NULL
  AND is_variant_null(parse_json('null')) = true
  AND is_variant_null(parse_json('{"a": 1}')) = false

-- to_char / to_number: round-tripping a grouping-format template
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE to_char(1234.56, '9,999.99') = '1,234.56'
  AND to_number('1,234.56', '9,999.99') = 1234.56
  AND to_number(to_char(9876.54, '9,999.99'), '9,999.99') = 9876.54
