-- skewness / kurtosis: Spark computes POPULATION moments (g1, excess
-- g2); DuckDB computes the SAMPLE-corrected estimators (G1, G2) — the
-- same SQL text returns different numbers by design, so Spark's
-- definition is pinned by value (computed at scale-free fixed input)
-- instead of diffed.  corr/covar agree and are differential.

statement
CREATE TABLE t_sk(x double) USING parquet

statement
INSERT INTO t_sk VALUES (1.0), (2.0), (4.0), (8.0), (16.0), (32.0)

-- expect-rows: 1
query spark_only
SELECT skewness(x) AS sk FROM t_sk HAVING abs(skewness(x) - 1.0952208831357406) < 1e-12

-- expect-rows: 1
query spark_only
SELECT kurtosis(x) AS ku FROM t_sk HAVING abs(kurtosis(x) - (-0.21430162619737203)) < 1e-12

query tolerance=1e-9
SELECT corr(x, x * 2 + 1) AS c, covar_pop(x, x) AS cp, covar_samp(x, x) AS cs FROM t_sk
