-- Encoding surface: base64/unbase64, base-N conv, char/ascii.
-- DuckDB spells these to_base64/from_base64 (and has no conv), so
-- Spark's grammar is value-pinned; md5 differential lives in hash/.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE base64(CAST('hi' AS BINARY)) = 'aGk='
  AND CAST(unbase64('aGk=') AS STRING) = 'hi'
  AND base64(unbase64(base64(CAST('round' AS BINARY)))) = base64(CAST('round' AS BINARY))

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE conv('ff', 16, 10) = '255'
  AND conv('255', 10, 2) = '11111111'
  AND conv('777', 8, 10) = '511'
  AND conv('z', 36, 10) = '35'

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE char(66) = 'B' AND ascii('B') = 66 AND ascii('') = 0
