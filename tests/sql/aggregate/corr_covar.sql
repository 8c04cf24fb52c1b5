statement
CREATE TABLE t_cc(x double, y double) USING parquet

statement
INSERT INTO t_cc VALUES (1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2), (NULL, 1.0)

query tolerance=1e-9
SELECT corr(x, y) AS c, covar_samp(x, y) AS cs, covar_pop(x, y) AS cp FROM t_cc

-- degenerate second-moment edges (round 8): a zero-variance
-- regressor makes Pearson r undefined — Spark 4 under ANSI RAISES
-- DIVIDE_BY_ZERO from the r = cov/(sx*sy) division (DuckDB and the
-- standard return NULL), while the single-sample covar_samp stays a
-- quiet NULL (its n-1 guard precedes any division) and covar_pop of
-- one pair is exactly 0.  regr_slope guards its own denominator and
-- returns NULL on constant x in BOTH engines — the inconsistency
-- inside Spark (corr raises, regr_slope doesn't) is the pin.
query expect_error=DIVIDE_BY_ZERO
SELECT corr(x, y) FROM (VALUES (1.0, 2.0), (1.0, 3.0)) t(x, y)

query
SELECT covar_samp(x, y) AS cs1, covar_pop(x, y) AS cp1
FROM (VALUES (1.0, 2.0)) t(x, y)

query tolerance=1e-9
SELECT regr_slope(y, x) AS rs_const
FROM (VALUES (1.0, 2.0), (1.0, 3.0)) t(x, y)
