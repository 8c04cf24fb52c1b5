-- ascii() beyond the plain codepoint round trip pinned in
-- chr_ascii_codepoints.sql (reference:
-- sql-tests/expressions/string/ascii.sql): the empty string yields 0
-- (not NULL), only the FIRST character is read (multibyte strings
-- included), and NULL propagates.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE ascii('') = 0
  AND ascii('A') = 65
  AND ascii('ABC') = 65
  AND ascii('héllo') = 104
  AND ascii(NULL) IS NULL

-- non-ASCII FIRST character: ascii returns its full codepoint
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE ascii('é') = 233
  AND ascii('€x') = 8364
