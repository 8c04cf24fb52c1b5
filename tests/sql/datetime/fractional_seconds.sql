-- Sub-second timestamp handling: microsecond literals, millisecond
-- parse, second/minute truncation are shared; astral-plane codepoints
-- (emoji = one codepoint in length/substr) agree too.  DIVERGENCE
-- (documented): EXTRACT(SECOND) INCLUDES the fraction in Spark
-- (DECIMAL 1.500000) but is the integer second in DuckDB.

query
SELECT TIMESTAMP '2020-01-01 12:00:00.123456' AS micro_literal

query
SELECT CAST('2020-01-01 12:00:00.123' AS TIMESTAMP) AS milli_parse

query
SELECT date_trunc('second', TIMESTAMP '2020-01-01 00:00:01.9') AS trunc_s, date_trunc('minute', TIMESTAMP '2020-01-01 00:01:31') AS trunc_m

query
SELECT length('😀') AS emoji_one_cp, length('a😀b') AS mixed_three, substr('a😀b', 2, 1) AS pick_emoji

-- expect-rows: 1
query spark_only
SELECT EXTRACT(SECOND FROM TIMESTAMP '2020-01-01 00:00:01.5') AS s WHERE EXTRACT(SECOND FROM TIMESTAMP '2020-01-01 00:00:01.5') = 1.5
