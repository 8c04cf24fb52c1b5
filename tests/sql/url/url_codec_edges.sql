-- url_encode / url_decode byte-level edges: space becomes '+' (form
-- encoding, not %20 — though decode accepts both), '~' is ESCAPED
-- (Java URLEncoder treats it as reserved, unlike RFC 3986) while
-- '-', '_', '.', '*' pass through, multibyte input round-trips via
-- UTF-8 percent sequences
-- (reference: sql-tests/expressions/url/{url_encode,url_decode,
-- try_url_decode}.sql).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE url_encode('AZaz09-_.*~') = 'AZaz09-_.*%7E'
  AND url_encode(' +') = '+%2B'
  AND url_encode('a b&c=d') = 'a+b%26c%3Dd'

-- decode accepts BOTH '+' and '%20' for space
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE url_decode('a+b') = 'a b'
  AND url_decode('a%20b') = 'a b'

-- multibyte: é is %C3%A9 in UTF-8, and the round-trip is identity
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE url_decode('%C3%A9') = 'é'
  AND url_encode('é') = '%C3%A9'
  AND url_decode(url_encode('hällo wörld/path?q=1')) = 'hällo wörld/path?q=1'

-- malformed percent escapes: strict raises, try_ NULLs
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_url_decode('%zz') IS NULL
  AND try_url_decode('%') IS NULL
  AND try_url_decode(NULL) IS NULL

query expect_error=CANNOT_DECODE_URL
SELECT url_decode('%zz')
