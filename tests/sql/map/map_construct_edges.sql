-- map construction edge matrix: map_from_arrays / map_from_entries /
-- map_concat + duplicate-key policy (reference: .../expressions/map/
-- map_from_arrays.sql, map_from_entries.sql; str_to_map.sql's
-- LAST_WIN TODO).  Duplicate keys: Spark's default policy is
-- EXCEPTION; this file pins the LAST_WIN policy via per-file config —
-- the only policy under which duplicate-key construction has a value
-- to pin (the runner can't assert raises).

-- Config: spark.sql.mapKeyDedupPolicy=LAST_WIN

-- map_from_arrays: aligned keys/values; null VALUES fine; mismatched
-- lengths raise (not pinned); null input array -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map_from_arrays(array('a', 'b'), array(1, 2)), 'b') = 2
  AND element_at(map_from_arrays(array('k'), array(CAST(NULL AS INT))),
                 'k') IS NULL
  AND size(map_from_arrays(array(), array())) = 0
  AND map_from_arrays(CAST(NULL AS ARRAY<STRING>), array(1)) IS NULL

-- map_from_entries: struct pairs; null entry poisons; empty -> empty
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map_from_entries(array(struct('a', 1), struct('b', 2))),
                 'a') = 1
  AND map_from_entries(array(struct('a', 1),
                             CAST(NULL AS STRUCT<col1: STRING, col2: INT>)))
      IS NULL
  AND map_from_entries(CAST(NULL AS ARRAY<STRUCT<k: STRING, v: INT>>))
      IS NULL

-- duplicate keys under LAST_WIN: the LAST writer wins, across every
-- constructor (map(), map_from_arrays, map_from_entries, map_concat)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map('k', 1, 'k', 2), 'k') = 2
  AND element_at(map_from_arrays(array('k', 'k'), array(1, 2)), 'k') = 2
  AND element_at(map_from_entries(array(struct('k', 1), struct('k', 2))),
                 'k') = 2
  AND element_at(map_concat(map('k', 1), map('k', 2)), 'k') = 2
  AND size(map_concat(map('k', 1), map('k', 2))) = 1

-- map_concat: disjoint merge keeps both sides' insertion order;
-- empty identity; NULL input poisons
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(map_keys(map_concat(map('a', 1), map('b', 2))), ',')
      = 'a,b'
  AND size(map_concat(map(), map('a', 1))) = 1
  AND size(map_concat()) = 0
  AND map_concat(map('a', 1), CAST(NULL AS MAP<STRING, INT>)) IS NULL
