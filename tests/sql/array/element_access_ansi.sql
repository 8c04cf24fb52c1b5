-- ANSI-mode collection access error matrix (reference:
-- sql-tests/expressions/array/element_at_ansi.sql,
-- get_array_item_ansi.sql; the reference `ignore`s these pending its
-- issue #3375 — here the Spark-native behavior IS the contract).
-- Under ANSI (the Spark 4 default): element_at out-of-bounds and the
-- [] subscript out-of-bounds RAISE, element_at index 0 RAISES with a
-- dedicated error class — while a missing MAP key stays NULL (Spark 4
-- dropped the 3.x raise) and the try_/get() escapes and NULL inputs
-- stay NULL.  Non-ANSI NULL
-- semantics for the same accessors: array_element_access_edges.sql,
-- map_access_edges.sql.  Collection values are inlined (DuckDB never
-- sees expect_error/spark_only blocks, but `statement` blocks run on
-- both engines and DuckDB can't parse Spark's array<int> DDL).

-- Config: spark.sql.ansi.enabled=true

-- element_at beyond length raises, both directions, column + literal
query expect_error=INVALID_ARRAY_INDEX
SELECT element_at(arr, 10) FROM (SELECT array(1, 2, 3) AS arr)

query expect_error=INVALID_ARRAY_INDEX
SELECT element_at(arr, -10) FROM (SELECT array(1, 2, 3) AS arr)

query expect_error=INVALID_ARRAY_INDEX
SELECT element_at(array(1, 2, 3), 5)

-- element_at index 0: dedicated error class (1-based indexing)
query expect_error=INVALID_INDEX_OF_ZERO
SELECT element_at(arr, 0) FROM (SELECT array(1, 2, 3) AS arr)

query expect_error=INVALID_INDEX_OF_ZERO
SELECT element_at(array(1, 2, 3), 0)

-- [] subscript (0-based) out of bounds raises under ANSI
query expect_error=INVALID_ARRAY_INDEX
SELECT arr[3] FROM (SELECT array(1, 2, 3) AS arr)

query expect_error=INVALID_ARRAY_INDEX
SELECT arr[-1] FROM (SELECT array(1, 2, 3) AS arr)

-- missing map key: NULL even under ANSI in Spark 4 (the 3.x
-- MAP_KEY_DOES_NOT_EXIST raise was dropped — map access is
-- lookup-like, array access is index-like; probed on 4.1)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok FROM (SELECT map('a', 1) AS m)
WHERE element_at(m, 'zzz') IS NULL AND m['zzz'] IS NULL

-- the escapes hold under ANSI: try_element_at -> NULL, get() (always
-- 0-based, never raises) -> NULL, NULL index -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok FROM (SELECT array(1, 2, 3) AS arr, map('a', 1) AS m)
WHERE try_element_at(arr, 10) IS NULL
  AND try_element_at(arr, -10) IS NULL
  AND try_element_at(m, 'zzz') IS NULL
  AND get(arr, 3) IS NULL
  AND get(arr, -1) IS NULL
  AND element_at(arr, CAST(NULL AS INT)) IS NULL

-- in-bounds access is unchanged by ANSI
-- expect-rows: 1
query spark_only
SELECT 1 AS ok FROM (SELECT array(1, 2, 3) AS arr, map('a', 1) AS m)
WHERE element_at(arr, 1) = 1 AND element_at(arr, -1) = 3
  AND arr[0] = 1 AND get(arr, 2) = 3 AND element_at(m, 'a') = 1
  AND try_element_at(arr, 2) = 2
