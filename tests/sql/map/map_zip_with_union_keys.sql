-- map_zip_with iterates the UNION of both key sets: a key present on
-- one side only gets NULL for the other side's lambda argument —
-- distinct from zip_with's positional padding
-- (reference: sql-tests/expressions/map lambda coverage).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_zip_with(map(1,'a',2,'b'), map(2,'x',3,'y'),
        (k, v1, v2) -> concat(coalesce(v1,'-'), coalesce(v2,'-'))))
      = '{"1":"a-","2":"bx","3":"-y"}'

-- empty side: every key comes from the other map, v1 always NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_zip_with(map(), map(1, 'x'), (k, v1, v2) -> coalesce(v1, v2)))
      = '{"1":"x"}'
  AND size(map_zip_with(map(), map(), (k, v1, v2) -> v1)) = 0

-- the key itself is usable in the lambda
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_zip_with(map(1, 10, 2, 20), map(1, 100, 2, 200),
        (k, v1, v2) -> k + v1 + v2))
      = '{"1":111,"2":222}'

-- a NULL lambda result is a legal map VALUE — and unlike null STRUCT
-- fields (dropped by to_json), null MAP values are RENDERED as null,
-- because a map key must appear to exist
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(map_zip_with(map(1,'a'), map(2,'x'),
        (k, v1, v2) -> CASE WHEN v1 IS NULL THEN NULL ELSE v1 END))
      = '{"1":"a","2":null}'
  AND size(map_zip_with(map(1,'a'), map(2,'x'), (k, v1, v2) -> NULL)) = 2

-- NULL map propagates
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE map_zip_with(cast(NULL as map<int,string>), map(1,'x'), (k, v1, v2) -> v1) IS NULL
