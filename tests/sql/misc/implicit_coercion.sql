-- Implicit type coercion at comparison and set-op boundaries, decimal
-- literal exactness, infinity string casts, binary string ordering.

query
SELECT '1' = 1 AS str_int, '2.5' = 2.5 AS str_dec

query
SELECT 0.1 + 0.2 = 0.3 AS decimal_exact

query
SELECT CAST('inf' AS double) AS pinf, CAST('-Infinity' AS double) AS ninf, CAST('NaN' AS double) AS nan_v

query
SELECT 1 UNION SELECT CAST(2.5 AS double) ORDER BY 1

query
SELECT 'a' < 'B' AS case_matters, 'abc' < 'abd' AS lex

query
SELECT x, x IS NULL AS isn FROM (VALUES (1), (NULL), (3)) t(x) ORDER BY x NULLS FIRST
