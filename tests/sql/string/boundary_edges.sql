-- String boundary edges.  Shared rows: negative/zero substr origins,
-- repeat(0/-1), zero-width lpad, empty-needle replace, concat_ws NULL
-- separator.  DIVERGENCES (documented, Spark pinned):
--   * split_part with an EMPTY delimiter: Spark returns the whole
--     string as part 1; DuckDB splits per character.
--   * left/right with NEGATIVE n: Spark returns ''; DuckDB drops |n|
--     chars from the other end.
--   * two-arg trim argument ORDER: Spark is trim(trimStr, srcStr);
--     DuckDB is trim(srcStr, chars) — same call, operands swapped.
--   * lpad with an empty pad string: Spark returns the input; DuckDB
--     raises.

query
SELECT substr('hello', -3) AS neg_start, substr('hello', 0) AS zero_start, substr('hello', -3, 2) AS neg_len, substr('hello', 10) AS past_end

query
SELECT repeat('ab', 0) AS r0, repeat('ab', -1) AS rneg, lpad('abc', 0, '0') AS l0, rpad('abc', 2, '') AS rp2

query
SELECT replace('aaa', '', 'x') AS rep_empty_needle, replace('', 'a', 'b') AS rep_on_empty, concat_ws('-', 'a', NULL, 'b') AS cw, concat_ws(NULL, 'a', 'b') AS cw_null_sep

-- expect-rows: 1
query spark_only
SELECT split_part('a,b', '', 1) AS whole WHERE split_part('a,b', '', 1) = 'a,b'

-- expect-rows: 1
query spark_only
SELECT left('abc', -1) AS ln, right('abc', -1) AS rn WHERE left('abc', -1) = '' AND right('abc', -1) = ''

-- expect-rows: 1
query spark_only
SELECT trim('x', 'xxabcxx') AS t WHERE trim('x', 'xxabcxx') = 'abc' AND trim('', 'abc') = 'abc'

-- expect-rows: 1
query spark_only
SELECT lpad('abc', 6, '') AS lp WHERE lpad('abc', 6, '') = 'abc'
