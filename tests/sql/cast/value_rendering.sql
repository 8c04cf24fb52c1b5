-- Value-to-string rendering: in-range doubles, float32 round trips,
-- decimal/timestamp/date/boolean renders are shared.  DIVERGENCE
-- (documented): scientific-notation spelling for doubles past the
-- plain-notation range — Spark renders Java style ('1.0E20'), DuckDB
-- C style ('1e+20').  Same value class as decimal(38,18) LEGACY
-- '0E-18' in tests/test_cast_pairs.py.

query
SELECT CAST(CAST(1.0 AS DOUBLE) AS STRING) AS one_dbl, CAST(CAST(100 AS DOUBLE) AS STRING) AS hundred, CAST(0.00001 AS STRING) AS small_plain

query
SELECT CAST(CAST(0.1 AS FLOAT) AS STRING) AS f32_render

query
SELECT CAST(123456789.123456789 AS STRING) AS dec_str, CAST(true AS STRING) AS b_str

query
SELECT CAST(TIMESTAMP '2020-01-01 00:00:00' AS STRING) AS ts_str, CAST(DATE '2020-01-01' AS STRING) AS d_str

-- expect-rows: 1
query spark_only
SELECT CAST(1e20 AS STRING) AS sci WHERE CAST(1e20 AS STRING) = '1.0E20'
