-- array construction edge matrix: array() / array_repeat / concat /
-- array_append / array_prepend / array_compact / sequence
-- (reference: .../expressions/array/create_array.sql,
-- array_repeat.sql, array_concat.sql, array_append.sql,
-- array_compact.sql).  The sharp edges: repeat with zero/negative
-- count, concat's NULL poisoning, append/prepend of NULL elements
-- (append keeps them, compact strips them), and sequence direction.

-- array_repeat: 0 and negative counts -> empty; NULL count -> NULL;
-- repeating a NULL element builds a real array of nulls
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_repeat('x', 3), ',') = 'x,x,x'
  AND size(array_repeat('x', 0)) = 0
  AND size(array_repeat('x', -2)) = 0
  AND array_repeat('x', CAST(NULL AS INT)) IS NULL
  AND array_join(array_repeat(CAST(NULL AS STRING), 2), ',', 'N') = 'N,N'

-- concat on arrays: order-preserving, duplicate-keeping, NULL input
-- poisons (unlike array_union which dedupes)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(concat(array(1, 2), array(2, 3)), ',') = '1,2,2,3'
  AND array_join(concat(array(1), array(), array(2)), ',') = '1,2'
  AND concat(array(1), CAST(NULL AS ARRAY<INT>)) IS NULL
  AND array_join(concat(array(1, NULL), array(2)), ',', 'N') = '1,N,2'

-- array_append / array_prepend: NULL element is APPENDED (not
-- dropped); NULL array -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_append(array(1, 2), 3), ',') = '1,2,3'
  AND array_join(array_append(array(1, 2), CAST(NULL AS INT)), ',', 'N')
      = '1,2,N'
  AND array_append(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND array_join(array_prepend(array(2, 3), 1), ',') = '1,2,3'
  AND array_join(array_prepend(array(), 1), ',') = '1'

-- array_compact strips ONLY nulls (empty strings and zeros survive)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_compact(array(1, NULL, 2, NULL)), ',') = '1,2'
  AND array_join(array_compact(array('', NULL, 'a')), '|') = '|a'
  AND size(array_compact(array(CAST(NULL AS INT)))) = 0
  AND array_compact(CAST(NULL AS ARRAY<INT>)) IS NULL
  AND array_join(array_compact(array(0, NULL)), ',') = '0'

-- sequence: both directions, custom step, single element when
-- start = stop; a step stepping AWAY from stop errors (not pinned —
-- runner can't assert raises); date sequences via interval step
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(sequence(1, 5), ',') = '1,2,3,4,5'
  AND array_join(sequence(5, 1), ',') = '5,4,3,2,1'
  AND array_join(sequence(1, 9, 3), ',') = '1,4,7'
  AND array_join(sequence(3, 3), ',') = '3'
  AND array_join(sequence(DATE'2024-01-01', DATE'2024-03-01',
                          INTERVAL '1' MONTH), ',')
      = '2024-01-01,2024-02-01,2024-03-01'

-- heterogeneous-width literals widen to the common type
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array(CAST(1 AS TINYINT), CAST(300 AS SMALLINT),
                       70000), ',') = '1,300,70000'
  AND array_join(array(1, 2.5d), ',') = '1.0,2.5'
