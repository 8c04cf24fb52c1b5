-- space() generator, luhn_check checksum validation, and the
-- startswith/endswith affix predicates — Spark surface, value-pinned.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE space(3) = '   ' AND length(space(5)) = 5 AND space(0) = ''

-- Luhn: valid test number, single-digit corruption fails
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE luhn_check('79927398713') = true
  AND luhn_check('79927398714') = false
  AND luhn_check('') = false

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE startswith('abcdef', 'abc') = true
  AND startswith('abcdef', 'bcd') = false
  AND endswith('abcdef', 'def') = true
  AND endswith('abcdef', 'abc') = false
  AND startswith('abc', '') = true
