-- URL expression surface, mirroring the reference corpus class
-- (reference: sql-tests/expressions/url/ — url_encode, url_decode,
-- try_url_decode; plus parse_url).  Spark-only value pins.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE url_encode('a b&c=d') = 'a+b%26c%3Dd'
  AND url_decode('a+b%26c%3Dd') = 'a b&c=d'

-- round trip is identity
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE url_decode(url_encode('hällo wörld/path?q=1')) = 'hällo wörld/path?q=1'

-- malformed percent-escape: try_ form is NULL instead of error
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE try_url_decode('%zz') IS NULL

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE parse_url('https://u:p@host.example:8443/a/b?q=1&r=2#frag', 'HOST') = 'host.example'
  AND parse_url('https://host.example/a/b?q=1&r=2', 'PATH') = '/a/b'
  AND parse_url('https://host.example/a/b?q=1&r=2', 'QUERY') = 'q=1&r=2'
  AND parse_url('https://host.example/a/b?q=1&r=2', 'QUERY', 'r') = '2'
  AND parse_url('https://host.example/a', 'PROTOCOL') = 'https'
