-- Field extraction THROUGH an array of structs — arr.field plucks a
-- column of the field across all elements (reference:
-- sql-tests/expressions/array/get_array_struct_fields.sql).
-- Inline-only (no table): DuckDB cannot parse Spark's array()/
-- named_struct() constructors, so statement blocks would fail on the
-- DuckDB side.

-- pluck across elements; NULL fields keep their slots
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
FROM (SELECT array(named_struct('f', 1, 'g', 'a'),
                   named_struct('f', 2, 'g', 'b')) AS arr)
WHERE array_join(arr.f, ',') = '1,2'
  AND array_join(arr.g, ',') = 'a,b'
  AND arr.f[1] = 2 AND arr.g[0] = 'a'

-- NULL field values survive as NULL slots; empty array plucks empty;
-- NULL array plucks NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
FROM (SELECT array(named_struct('f', CAST(NULL AS INT), 'g', 'c')) AS one,
             CAST(array() AS ARRAY<STRUCT<f: INT>>) AS empty,
             CAST(NULL AS ARRAY<STRUCT<f: INT>>) AS nada)
WHERE array_join(one.f, ',', 'N') = 'N'
  AND size(empty.f) = 0
  AND nada.f IS NULL

-- plucking a struct-of-struct one level deep
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
FROM (SELECT array(named_struct('s', named_struct('x', 7))) AS arr)
WHERE arr.s.x[0] = 7
