-- Default duplicate-map-key policy: EXCEPTION (reference:
-- sql-tests/expressions/map/map_from_arrays.sql,
-- map_from_entries.sql, str_to_map.sql carry duplicate-key rows).
-- map_construct_edges.sql pins the LAST_WIN policy via per-file
-- config; this file pins the DEFAULT — every construction path that
-- would produce a duplicate key RAISES DUPLICATED_MAP_KEY, and a
-- NULL key raises its own class regardless of policy.  (No Config
-- line: spark.sql.mapKeyDedupPolicy defaults to EXCEPTION.)

query expect_error=DUPLICATED_MAP_KEY
SELECT map(1, 'a', 1, 'b')

query expect_error=DUPLICATED_MAP_KEY
SELECT map_from_arrays(array(1, 1), array('a', 'b'))

query expect_error=DUPLICATED_MAP_KEY
SELECT map_from_entries(array(struct(1, 'a'), struct(1, 'b')))

query expect_error=DUPLICATED_MAP_KEY
SELECT map_concat(map(1, 'a'), map(1, 'b'))

query expect_error=DUPLICATED_MAP_KEY
SELECT str_to_map('k:1,k:2', ',', ':')

-- a NULL map key is illegal under EVERY dedup policy
query expect_error=NULL_MAP_KEY
SELECT map(CAST(NULL AS INT), 'a')

-- distinct keys construct fine under the default policy
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map(1, 'a', 2, 'b'), 2) = 'b'
  AND element_at(map_concat(map(1, 'a'), map(2, 'b')), 1) = 'a'
  AND element_at(str_to_map('j:1,k:2', ',', ':'), 'k') = '2'
