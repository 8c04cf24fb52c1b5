statement
CREATE TABLE t_sp(x double) USING parquet

statement
INSERT INTO t_sp VALUES (4.0), (2.0), (0.0), (NULL)

query tolerance=1e-12
SELECT sqrt(x) AS s, power(x, 3) AS p, exp(x) AS e FROM t_sp WHERE x IS NOT NULL ORDER BY x

query tolerance=1e-12
SELECT ln(x) AS l, log10(x) AS l10 FROM t_sp WHERE x > 0 ORDER BY x
