-- Higher-order map functions edge matrix: transform_keys /
-- transform_values / map_filter / map_zip_with (the lambda surface
-- over maps; reference class .../expressions/map/).  The sharp
-- edges: lambdas see null VALUES (never null keys), map_filter drops
-- on NULL predicate, and map_zip_with visits the UNION of keys with
-- NULL for the absent side.

-- Config: spark.sql.mapKeyDedupPolicy=LAST_WIN

-- transform_keys / transform_values see both key and value
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(transform_keys(map('a', 1, 'b', 2),
                                (k, v) -> upper(k)), 'B') = 2
  AND element_at(transform_values(map('a', 1, 'b', 2),
                                  (k, v) -> v * 10), 'b') = 20
  AND element_at(transform_values(map('a', 1), (k, v) -> concat(k, v)),
                 'a') = 'a1'
  AND element_at(transform_values(map('a', CAST(NULL AS INT)),
                                  (k, v) -> coalesce(v, -1)), 'a') = -1
  AND size(transform_keys(map(), (k, v) -> k)) = 0
  AND transform_values(CAST(NULL AS MAP<STRING, INT>), (k, v) -> v)
      IS NULL

-- map_filter: keeps only TRUE; FALSE and NULL both drop
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(map_filter(map('a', 1, 'b', 2, 'c', 3),
                      (k, v) -> v % 2 = 1)) = 2
  AND size(map_filter(map('a', CAST(NULL AS INT), 'b', 2),
                      (k, v) -> v > 0)) = 1
  AND size(map_filter(map(), (k, v) -> true)) = 0
  AND map_filter(CAST(NULL AS MAP<STRING, INT>), (k, v) -> true) IS NULL

-- map_zip_with: union of keys; the side missing a key contributes
-- NULL to the lambda
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(map_zip_with(map('a', 1, 'b', 2), map('b', 20, 'c', 30),
                              (k, v1, v2) -> coalesce(v1, 0)
                                             + coalesce(v2, 0)), 'a') = 1
  AND element_at(map_zip_with(map('a', 1, 'b', 2), map('b', 20, 'c', 30),
                              (k, v1, v2) -> coalesce(v1, 0)
                                             + coalesce(v2, 0)), 'b') = 22
  AND element_at(map_zip_with(map('a', 1, 'b', 2), map('b', 20, 'c', 30),
                              (k, v1, v2) -> coalesce(v1, 0)
                                             + coalesce(v2, 0)), 'c') = 30
  AND size(map_zip_with(map('a', 1), map('b', 2),
                        (k, v1, v2) -> 0)) = 2
  AND map_zip_with(map('a', 1), CAST(NULL AS MAP<STRING, INT>),
                   (k, v1, v2) -> v1) IS NULL
