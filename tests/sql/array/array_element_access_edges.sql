-- element_at / try_element_at / [] subscript edge matrix
-- (reference: .../expressions/array/element_at.sql,
-- element_at_ansi.sql, get_array_item.sql, get_array_item_ansi.sql).
-- Non-ANSI semantics here; the ANSI raise paths are pinned
-- declaratively in element_access_ansi.sql (expect_error directive)
-- and exercised on real parquet fixtures by tests/test_fixture_edges.py.

-- Config: spark.sql.ansi.enabled=false

-- 1-based positive and negative indexing; [] subscript is 0-based
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(array(10, 20, 30), 1) = 10
  AND element_at(array(10, 20, 30), 3) = 30
  AND element_at(array(10, 20, 30), -1) = 30
  AND element_at(array(10, 20, 30), -3) = 10
  AND array(10, 20, 30)[0] = 10
  AND array(10, 20, 30)[2] = 30

-- out-of-bounds (non-ANSI): NULL, both directions, both accessors
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(array(1, 2, 3), 5) IS NULL
  AND element_at(array(1, 2, 3), -5) IS NULL
  AND try_element_at(array(1, 2, 3), 9) IS NULL
  AND try_element_at(array(1, 2, 3), -9) IS NULL
  AND array(1, 2, 3)[7] IS NULL

-- NULL propagation: null array, null index, null element AT the index
-- (a hit on a null element and an out-of-bounds miss are
-- indistinguishable by value — both NULL)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(CAST(NULL AS ARRAY<INT>), 1) IS NULL
  AND element_at(array(1, 2, 3), CAST(NULL AS INT)) IS NULL
  AND element_at(array(1, NULL, 3), 2) IS NULL
  AND try_element_at(array(1, NULL, 3), -2) IS NULL

-- empty array: every access is NULL (non-ANSI)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_element_at(array(), 1) IS NULL
  AND size(array()) = 0

-- string and double element types round-trip through access
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE element_at(array('a', '', '中'), 3) = '中'
  AND element_at(array('a', '', 'c'), 2) = ''
  AND element_at(array(CAST('NaN' AS DOUBLE)), 1) <> 0.0 IS NULL
      OR isnan(element_at(array(CAST('NaN' AS DOUBLE)), 1))

-- get_array_struct_fields: field extraction distributes over the array
-- (reference: get_array_struct_fields.sql)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(
        transform(array(named_struct('a', 1, 'b', 'x'),
                        named_struct('a', 2, 'b', 'y')), s -> s.a), ',')
      = '1,2'
  AND element_at(array(named_struct('a', 1), named_struct('a', 2)), 2).a = 2
