-- NaN and -0.0 semantics: BOTH engines adopt the same non-IEEE SQL
-- conventions — NaN = NaN is TRUE, NaN forms one GROUP BY group, NaN
-- sorts GREATEST (after +Infinity), max() propagates it, and -0.0
-- equals 0.0.  These are the exact conventions the reference's
-- native kernels must re-implement on top of IEEE hardware
-- (its comparison/sort kernels special-case NaN and signed zero), so
-- the corpus pins them differentially.

query
SELECT CAST('NaN' AS DOUBLE) = CAST('NaN' AS DOUBLE) AS nan_eq, -0.0 = 0.0 AS zero_eq

query
SELECT x FROM (VALUES (CAST('NaN' AS DOUBLE)), (1.0), (CAST('Infinity' AS DOUBLE)), (CAST('-Infinity' AS DOUBLE))) t(x) ORDER BY x

query
SELECT x, count(*) AS n FROM (VALUES (CAST('NaN' AS DOUBLE)), (CAST('NaN' AS DOUBLE)), (1.0)) t(x) GROUP BY x ORDER BY x

query
SELECT max(x) AS mx, min(x) AS mn FROM (VALUES (CAST('NaN' AS DOUBLE)), (1.0)) t(x)

query
SELECT CAST(CAST('-0.0' AS DOUBLE) AS STRING) AS neg_zero_renders
