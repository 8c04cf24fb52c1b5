-- Float modulo (sign follows dividend, both engines), factorial at the
-- int64 boundary, power edges, decimal-vs-double round artifacts.
-- DIVERGENCE (documented): factorial(21) overflows int64 — Spark
-- returns NULL, DuckDB widens to HUGEINT and keeps going; 20! is the
-- last shared value.  ANSI `10 % 0` raises in Spark (try_mod is the
-- tolerant spelling) while DuckDB returns NULL.

query
SELECT 7.5 % 2 AS fmod_pos, -7.5 % 2 AS fmod_neg, mod(7.5, 2) AS mod_fn

query
SELECT factorial(20) AS f20

query
SELECT power(2, 62) AS p62, power(-8.0, 2.0) AS p_negbase

query
SELECT round(2.675, 2) AS r_decimal, round(CAST(2.675 AS DOUBLE), 2) AS r_double

query
SELECT floor(-2.5) AS fl, ceiling(2.1) AS ce

-- expect-rows: 1
query spark_only
SELECT factorial(21) AS f21 WHERE factorial(21) IS NULL

-- expect-rows: 1
query spark_only
SELECT try_mod(10, 0) AS tm WHERE try_mod(10, 0) IS NULL
