-- encode/decode charset round-trips, pinned through hex() so the
-- byte-level encoding is asserted, not just string equality; an
-- unsupported charset is a parameter error
-- (reference: string codec coverage in the reference's Rust string
-- kernels, native/spark-expr string module).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hex(encode('ab', 'utf-8')) = '6162'
  AND decode(X'616263', 'utf-8') = 'abc'
  AND decode(encode('round trip', 'utf-8'), 'utf-8') = 'round trip'

-- the same codepoint has different bytes per charset: é is E9 in
-- latin-1 but C3A9 in utf-8
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hex(encode('é', 'iso-8859-1')) = 'E9'
  AND hex(encode('é', 'utf-8')) = 'C3A9'
  AND decode(X'E9', 'iso-8859-1') = 'é'
  AND decode(X'C3A9', 'utf-8') = 'é'

-- us-ascii subset agrees with utf-8 on 7-bit input
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE decode(X'61', 'us-ascii') = 'a'
  AND hex(encode('a', 'us-ascii')) = hex(encode('a', 'utf-8'))

-- NULL propagation on either argument
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE encode(NULL, 'utf-8') IS NULL
  AND decode(cast(NULL as binary), 'utf-8') IS NULL

query expect_error=INVALID_PARAMETER_VALUE.CHARSET
SELECT encode('a', 'no-such-charset')

query expect_error=INVALID_PARAMETER_VALUE.CHARSET
SELECT decode(X'61', 'no-such-charset')
