-- arrays_zip shape matrix (reference:
-- sql-tests/expressions/array/arrays_zip.sql): shorter inputs pad
-- with NULL fields up to the longest length; a NULL array poisons;
-- result fields are addressable by position-derived names.

-- unequal lengths pad with NULLs to the longest input
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE size(arrays_zip(array(1, 2), array('a'))) = 2
  AND arrays_zip(array(1, 2), array('a'))[1]['0'] = 2
  AND arrays_zip(array(1, 2), array('a'))[1]['1'] IS NULL
  AND arrays_zip(array(1), CAST(NULL AS ARRAY<INT>)) IS NULL
  AND size(arrays_zip(array(), array())) = 0

-- three-way zip keeps positional field addressing
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE arrays_zip(array(1), array(2), array(3))[0]['2'] = 3
