-- array_insert edge matrix, mirroring the reference's per-function
-- depth (reference: spark/src/test/resources/sql-tests/expressions/
-- array/array_insert.sql — positions, null padding, negative indices,
-- null arguments, string/multibyte/special-double variants).
-- Spark array grammar isn't shared with DuckDB, so blocks are
-- value-pinned spark_only.

-- positions: middle / prepend / append (pos = len+1)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array(1, 2, 3), 2, 10), ',') = '1,10,2,3'
  AND array_join(array_insert(array(1, 2, 3), 1, 10), ',') = '10,1,2,3'
  AND array_join(array_insert(array(1, 2, 3), 4, 10), ',') = '1,2,3,10'
  AND array_join(array_insert(array(), 1, 10), ',') = '10'

-- positive out-of-bounds: null padding up to pos
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array(1, 2, 3), 5, 99), ',', 'N') = '1,2,3,N,99'
  AND array_join(array_insert(array(1, 2, 3), 7, 99), ',', 'N')
      = '1,2,3,N,N,N,99'

-- negative indices (non-legacy default): -1 appends AFTER the last
-- element; -4 lands before the first; beyond start pads with nulls
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array(1, 2, 3), -1, 10), ',') = '1,2,3,10'
  AND array_join(array_insert(array(1, 2, 3), -2, 10), ',') = '1,2,10,3'
  AND array_join(array_insert(array(1, 2, 3), -4, 10), ',') = '10,1,2,3'
  AND array_join(array_insert(array(1, 2, 3), -6, 10), ',', 'N')
      = '10,N,N,1,2,3'

-- NULL arguments: null array -> NULL, null pos -> NULL, null value
-- inserts a null element; array with existing nulls keeps them
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_insert(CAST(NULL AS ARRAY<INT>), 1, 10) IS NULL
  AND array_insert(array(1, 2, 3), CAST(NULL AS INT), 10) IS NULL
  AND array_join(array_insert(array(1, 2, 3), 2, CAST(NULL AS INT)),
                 ',', 'N') = '1,N,2,3'
  AND array_join(array_insert(array(1, NULL, 3), 2, 10), ',', 'N')
      = '1,10,N,3'

-- string arrays: empty strings and multibyte UTF-8 survive insertion
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array('a', 'b', 'c'), 2, 'd'), ',') = 'a,d,b,c'
  AND array_join(array_insert(array('', 'a', ''), 2, ''), '|') = '||a|'
  AND array_join(array_insert(array('abc', 'def'), 1, '中文'), ',')
      = '中文,abc,def'

-- double arrays: NaN / Infinity render through array_join exactly as
-- their scalar string forms; a -0.0 LITERAL is folded to 0.0 before
-- it ever reaches the array (Spark normalizes the literal — only a
-- computed -0.0 survives, and string-casts as '-0.0' would anyway
-- compare equal to 0.0)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
                              2, CAST('NaN' AS DOUBLE)), ',')
      = '1.0,NaN,2.0'
  AND array_join(array_insert(array(CAST(1.0 AS DOUBLE)), 2,
                              CAST('Infinity' AS DOUBLE)), ',')
      = '1.0,Infinity'
  AND array_join(array_insert(array(CAST(1.0 AS DOUBLE)), 1,
                              CAST(-0.0 AS DOUBLE)), ',')
      = '0.0,1.0'

-- integral width variants: tinyint/smallint/bigint keep their values
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE array_join(array_insert(array(CAST(1 AS TINYINT), CAST(2 AS TINYINT)),
                              2, CAST(3 AS TINYINT)), ',') = '1,3,2'
  AND array_join(array_insert(array(CAST(1 AS SMALLINT)), 1,
                              CAST(-32768 AS SMALLINT)), ',') = '-32768,1'
  AND array_join(array_insert(array(CAST(1 AS BIGINT)), 2,
                              CAST(9223372036854775807 AS BIGINT)), ',')
      = '1,9223372036854775807'
