-- map access edge matrix: element_at / [] / map_contains_key /
-- map_keys / map_values / map_entries (reference: .../expressions/
-- map/get_map_value.sql, map_contains_key.sql, map_keys.sql,
-- map_values.sql, map_entries.sql).  Non-ANSI: a missing key is NULL
-- (ANSI raises for [], element_at — covered by the cast/ANSI
-- fixtures).  The sharp edges: a NULL VALUE hit vs a missing key are
-- indistinguishable by element_at, keys keep insertion order, and
-- map functions never see null KEYS (Spark forbids them).

-- Config: spark.sql.ansi.enabled=false
-- Config: spark.sql.legacy.sizeOfNull=false

-- hits, misses, subscript form
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map('a', 1, 'b', 2), 'b') = 2
  AND element_at(map('a', 1), 'z') IS NULL
  AND try_element_at(map('a', 1), 'z') IS NULL
  AND map('a', 1, 'b', 2)['a'] = 1
  AND map('a', 1)['z'] IS NULL

-- NULL value stored under a real key: element_at can't distinguish
-- it from a miss; map_contains_key CAN
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map('k', CAST(NULL AS INT)), 'k') IS NULL
  AND map_contains_key(map('k', CAST(NULL AS INT)), 'k') = true
  AND map_contains_key(map('k', CAST(NULL AS INT)), 'z') = false
  AND map_contains_key(map(), 'z') = false

-- NULL propagation: null map, null probe key
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(CAST(NULL AS MAP<STRING, INT>), 'k') IS NULL
  AND element_at(map('a', 1), CAST(NULL AS STRING)) IS NULL
  AND map_contains_key(CAST(NULL AS MAP<STRING, INT>), 'k') IS NULL

-- keys/values/entries preserve insertion order; empty map -> empty
-- collections; entries render as structs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(map_keys(map('b', 2, 'a', 1)), ',') = 'b,a'
  AND array_join(map_values(map('b', 2, 'a', 1)), ',') = '2,1'
  AND size(map_keys(map())) = 0
  AND size(map_values(map())) = 0
  AND to_json(map_entries(map('x', 1)))
      = '[{"key":"x","value":1}]'
  AND array_join(map_values(map('a', CAST(NULL AS INT), 'b', 2)),
                 ',', 'N') = 'N,2'

-- cardinality/size on maps; null map -> NULL size.  This needs the
-- explicit legacy.sizeOfNull=false config above: the legacy flag
-- defaults TRUE and activates whenever ANSI is off, silently turning
-- size(NULL) into -1 — exactly the conf-coupling trap this file pins
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(map('a', 1, 'b', 2)) = 2
  AND size(map()) = 0
  AND size(CAST(NULL AS MAP<STRING, INT>)) IS NULL
