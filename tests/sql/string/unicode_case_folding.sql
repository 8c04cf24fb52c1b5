-- DIVERGENCE (documented): non-ASCII case folding.  Spark (Java's
-- String.toUpperCase) applies FULL case mapping — German ß expands to
-- 'SS', Turkish dotted İ lowers to 'i' + U+0307 combining dot —
-- while DuckDB maps ß to the capital sharp-s 'ẞ' (1:1) and İ to plain
-- 'i'.  ASCII-only case mapping is shared (unicode_multibyte.sql
-- covers accented-Latin agreement); Spark's full-mapping behavior is
-- pinned here.

query
SELECT upper('hello') AS up_ascii, lower('WORLD') AS lo_ascii, lcase('AbC') AS lc, ucase('AbC') AS uc

-- expect-rows: 1
query spark_only
SELECT upper('straße') AS ger WHERE upper('straße') = 'STRASSE' AND length(upper('straße')) = 7

-- expect-rows: 1
query spark_only
SELECT lower('İ') AS tur WHERE length(lower('İ')) = 2
