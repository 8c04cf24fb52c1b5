-- Config: spark.sql.ansi.enabled=false
-- elt out-of-range under LEGACY eval: NULL instead of the ANSI raise
-- (reference: sql-tests/expressions/string/string.sql legacy rows;
-- the ANSI raises are pinned in elt_find_in_set_edges.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE elt(0, 'a') IS NULL
  AND elt(4, 'a', 'b') IS NULL
  AND elt(-1, 'a') IS NULL
  AND elt(2, 'a', 'b') = 'b'
