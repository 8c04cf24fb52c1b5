-- to_binary / try_to_binary across the hex/base64/utf-8 formats:
-- hex is the default format, odd-length hex is LEFT-padded (one
-- nibble), malformed input raises in to_binary but NULLs in try_
-- (reference: cast/conversion coverage in the reference's Rust cast
-- kernels, native/spark-expr conversion module).

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hex(to_binary('6162', 'hex')) = '6162'
  AND hex(to_binary('6162')) = '6162'
  AND hex(to_binary('YWJj', 'base64')) = '616263'
  AND hex(to_binary('ab', 'utf-8')) = '6162'

-- odd-length hex: '6' is one nibble -> 0x06, NOT an error
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE hex(to_binary('6', 'hex')) = '06'
  AND hex(try_to_binary('6', 'hex')) = '06'

-- try_ returns NULL where strict raises
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_to_binary('zz', 'hex') IS NULL
  AND try_to_binary('zz&', 'base64') IS NULL
  AND try_to_binary(NULL, 'hex') IS NULL

-- round-trips through the inverse functions
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE base64(to_binary('YWJj', 'base64')) = 'YWJj'
  AND cast(to_binary('hi', 'utf-8') as string) = 'hi'

query expect_error=CONVERSION_INVALID_INPUT
SELECT to_binary('zz', 'hex')

query expect_error=CONVERSION_INVALID_INPUT
SELECT to_binary('not base64!!', 'base64')
