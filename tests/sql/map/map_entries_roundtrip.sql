-- map_entries <-> map_from_entries round-trip: entries preserve
-- insertion order, map equality is NOT an orderable operation in
-- Spark (assert through to_json), null VALUES survive while to_json
-- drops them, and duplicate keys raise under the default EXCEPTION
-- dedup policy (reference: sql-tests/expressions/map/{map_entries,
-- map_from_entries}.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_entries(map(2, 'b', 1, 'a')))
        = '[{"key":2,"value":"b"},{"key":1,"value":"a"}]'
  AND to_json(map_from_entries(map_entries(map(2, 'b', 1, 'a'))))
        = to_json(map(2, 'b', 1, 'a'))
  AND size(map_entries(map())) = 0

-- null values survive the round-trip (to_json omits the null field)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_entries(map(1, cast(NULL as string)))) = '[{"key":1}]'
  AND map_from_entries(map_entries(map(1, cast(NULL as string))))[1] IS NULL
  AND size(map_from_entries(map_entries(map(1, cast(NULL as string))))) = 1

-- entries are real structs: field access composes with transform
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE transform(map_entries(map(1, 'a', 2, 'b')), e -> e.key) = array(1, 2)
  AND transform(map_entries(map(1, 'a', 2, 'b')), e -> e.value) = array('a', 'b')

-- NULL propagation
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE map_entries(cast(NULL as map<int,string>)) IS NULL
  AND map_from_entries(cast(NULL as array<struct<k:int,v:string>>)) IS NULL

query expect_error=DUPLICATED_MAP_KEY
SELECT map_from_entries(array(struct(1, 'a'), struct(1, 'b')))
