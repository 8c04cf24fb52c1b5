-- DIVERGENCE (documented): casting a fractional DECIMAL literal to
-- int TRUNCATES toward zero in Spark, ROUNDS half-up in DuckDB.
-- Spark's truncation is pinned; the differential block uses fractions
-- below one half, where truncate == round-half-up and both agree.
-- (Full per-pair sweep: tests/test_cast_pairs.py.)

query
SELECT CAST(1.2 AS int) AS a, CAST(-1.2 AS int) AS b, CAST(2.4 AS int) AS c

-- expect-rows: 1
query spark_only
SELECT CAST(1.5 AS int) AS h1, CAST(2.9 AS int) AS h2, CAST(-1.5 AS int) AS h3 WHERE CAST(1.5 AS int) = 1 AND CAST(2.9 AS int) = 2 AND CAST(-1.5 AS int) = -1
