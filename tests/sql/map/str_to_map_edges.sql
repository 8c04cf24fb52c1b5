-- str_to_map edge matrix (reference: .../expressions/map/
-- str_to_map.sql, derived from Spark's ComplexTypeSuite
-- "StringToMap").  The sharp edges: default delimiters (',' and
-- ':'), a pair with NO key-value delimiter maps the whole pair to a
-- NULL value, the empty string produces {"" -> NULL}, and values
-- keep interior spaces.

-- defaults and custom delimiters
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(str_to_map('a:1,b:2,c:3'), 'b') = '2'
  AND element_at(str_to_map('a=1,b=2', ',', '='), 'a') = '1'
  AND element_at(str_to_map('x=9;y=8', ';', '='), 'y') = '8'
  AND element_at(str_to_map('a:1_b:2', '_', ':'), 'b') = '2'
  AND size(str_to_map('a:1,b:2,c:3')) = 3

-- value edge shapes: preserved spaces, empty value, missing
-- key-value delimiter -> NULL value, single bare key
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(str_to_map('a: ,b:2'), 'a') = ' '
  AND element_at(str_to_map('a:,b:2'), 'a') = ''
  AND str_to_map('a,b:2')['a'] IS NULL
  AND map_contains_key(str_to_map('a,b:2'), 'a') = true
  AND str_to_map('a')['a'] IS NULL
  AND size(str_to_map('a')) = 1

-- empty input: one entry, empty key, NULL value; NULL input -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(str_to_map('')) = 1
  AND map_contains_key(str_to_map(''), '') = true
  AND str_to_map('')[''] IS NULL
  AND str_to_map(CAST(NULL AS STRING)) IS NULL

-- delimiters are REGEXES, not literal strings: character classes and
-- quantifiers apply (an unescaped '|' or '.' would not split literally)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(str_to_map('a:1xXb:2', '[xX]+', ':'), 'b') = '2'
  AND size(str_to_map('a:1|b:2', '[|]', ':')) = 2
  AND element_at(str_to_map('k1=v1', '[,]', '='), 'k1') = 'v1'
