-- parse_url part extraction depth: every part key, missing parts ->
-- NULL, QUERY with an absent parameter -> NULL, invalid URL raises
-- while try_parse_url NULLs
-- (reference: sql-tests/expressions/url/ corpus class).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'HOST') = 'host.example'
  AND parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'USERINFO') = 'u:p'
  AND parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'AUTHORITY') = 'u:p@host.example:8443'
  AND parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'FILE') = '/a/b?q=1&r=2'
  AND parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'REF') = 'frag'
  AND parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'PROTOCOL') = 'https'

-- absent parts and absent query parameters are NULL, not ''
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE parse_url('https://host/a', 'REF') IS NULL
  AND parse_url('https://host/a', 'USERINFO') IS NULL
  AND parse_url('https://host/a', 'QUERY') IS NULL
  AND parse_url('https://host/a?q=1', 'QUERY', 'zz') IS NULL

-- protocol-relative URLs still parse the authority
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE parse_url('//host/a', 'HOST') = 'host'
  AND parse_url('//host/a', 'PROTOCOL') IS NULL

-- try_ form tolerates garbage; NULL propagates
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_parse_url('not a url', 'HOST') IS NULL
  AND try_parse_url(NULL, 'HOST') IS NULL
  AND parse_url(NULL, 'HOST') IS NULL

query expect_error=INVALID_URL
SELECT parse_url('not a url', 'HOST')
