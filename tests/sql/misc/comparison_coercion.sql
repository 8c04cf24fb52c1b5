-- Mixed-type comparison coercion: string-vs-numeric compares
-- NUMERICALLY in both engines ('10' < 9 is FALSE — not lexicographic),
-- date/timestamp-vs-string coerces to the temporal type, booleans
-- order false < true, int-vs-decimal-vs-double compare exactly.
-- DIVERGENCE (documented): under ANSI Spark RAISES comparing a
-- non-integral string to an int ('1e2' = 100, '' = 0) where DuckDB
-- coerces to double — pinned via the try_cast equivalent since the
-- runner can't assert raises.  Binary comparison is byte-order in
-- both but the type is spelled BINARY vs BLOB.

query
SELECT '10' < 9 AS str_lt_num, '10' = 10 AS str_eq_num, '007' = 7 AS leading_zeros

query
SELECT DATE '2020-01-01' = '2020-01-01' AS d_eq, DATE '2020-01-02' > '2020-01-01' AS d_gt, TIMESTAMP '2020-01-01 00:00:00' = '2020-01-01 00:00:00' AS ts_eq

query
SELECT true > false AS t_gt_f, x FROM (VALUES (true), (false)) t(x) ORDER BY x

query
SELECT 1 = 1.0 AS int_dec, 0.1 = CAST(0.1 AS DOUBLE) AS dec_dbl_exact

-- the ANSI raise class, pinned through its try_cast shadow
-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE try_cast('1e2' AS INT) IS NULL AND try_cast('' AS INT) IS NULL AND try_cast('1e2' AS DOUBLE) = 100.0

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE CAST('ab' AS BINARY) < CAST('b' AS BINARY)
