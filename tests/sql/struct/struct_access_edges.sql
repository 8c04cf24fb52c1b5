-- struct construction/access edge matrix: named_struct / struct /
-- field access / nested nulls / struct equality (reference:
-- .../expressions/struct/create_named_struct.sql,
-- get_struct_field.sql).  The sharp edges: field access on a NULL
-- struct is NULL (not an error), struct equality is field-wise with
-- null-safe ordering semantics, and nesting preserves null leaves.

-- construction and field access; struct() auto-names col1, col2, ...
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE named_struct('a', 1, 'b', 'x').a = 1
  AND named_struct('a', 1, 'b', 'x').b = 'x'
  AND struct(1, 'x').col1 = 1
  AND struct(1, 'x').col2 = 'x'

-- NULL leaves vs NULL struct: access distributes over NULL structs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE named_struct('a', CAST(NULL AS INT), 'b', 2).a IS NULL
  AND named_struct('a', CAST(NULL AS INT), 'b', 2).b = 2
  AND CAST(NULL AS STRUCT<a: INT, b: STRING>).a IS NULL
  AND CAST(NULL AS STRUCT<a: INT>) IS NULL

-- nesting: struct-in-struct, struct-of-array, array-of-struct
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE named_struct('inner', named_struct('x', 7)).inner.x = 7
  AND named_struct('arr', array(1, 2, 3)).arr[1] = 2
  AND element_at(array(named_struct('v', 10), named_struct('v', 20)),
                 2).v = 20
  AND named_struct('inner',
        CAST(NULL AS STRUCT<x: INT>)).inner.x IS NULL

-- struct equality and ordering: field-wise, left-to-right.  Unlike
-- scalar `=`, struct `=` is NOT three-valued over NULL fields — it
-- delegates to the struct ORDERING, where NULL equals NULL, so two
-- structs with matching null fields compare TRUE under plain `=`
-- (and `<=>` agrees)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE (named_struct('a', 1, 'b', 2) = named_struct('a', 1, 'b', 2)) = true
  AND (named_struct('a', 1, 'b', 2) = named_struct('a', 1, 'b', 3)) = false
  AND (named_struct('a', 1, 'b', CAST(NULL AS INT))
       = named_struct('a', 1, 'b', CAST(NULL AS INT))) = true
  AND (named_struct('a', 1, 'b', CAST(NULL AS INT))
       <=> named_struct('a', 1, 'b', CAST(NULL AS INT))) = true
  AND (named_struct('a', 1) < named_struct('a', 2)) = true
  AND (named_struct('a', 2, 'b', 0) > named_struct('a', 1, 'b', 9)) = true

-- rendering: to_json OMITS null leaves by default; only
-- ignoreNullFields=false serializes them as JSON null
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE to_json(named_struct('a', 1, 'b', CAST(NULL AS STRING)))
      = '{"a":1}'
  AND to_json(named_struct('a', 1, 'b', CAST(NULL AS STRING)),
              map('ignoreNullFields', 'false'))
      = '{"a":1,"b":null}'
  AND to_json(named_struct('o', named_struct('x', array(1, 2))))
      = '{"o":{"x":[1,2]}}'
