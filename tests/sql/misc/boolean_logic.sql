-- Three-valued logic: NULL-absorbing AND/OR, NOT, boolean casts,
-- BETWEEN / NOT BETWEEN.

query
SELECT TRUE AND NULL AS a, FALSE AND NULL AS b, TRUE OR NULL AS c, FALSE OR NULL AS d, NOT CAST(NULL AS boolean) AS e

query
SELECT CAST('true' AS boolean) AS st, CAST('0' AS boolean) AS s0, CAST(0 AS boolean) AS i0, CAST(7 AS boolean) AS i7

query
SELECT x, x BETWEEN 2 AND 4 AS btw, x NOT BETWEEN 2 AND 4 AS nbtw FROM (VALUES (1), (3), (5), (NULL)) t(x) ORDER BY x NULLS FIRST

-- NULL bound makes the comparison UNKNOWN, filtered out by WHERE
query
SELECT x FROM (VALUES (1), (3)) t(x) WHERE x BETWEEN NULL AND 5 ORDER BY x
