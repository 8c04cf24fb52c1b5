statement
CREATE TABLE t_log(x double) USING parquet

statement
INSERT INTO t_log VALUES (1.0), (2.0), (8.0), (1024.0)

query tolerance=1e-12
SELECT log2(x) AS l2, ln(x) AS lnn, exp(ln(x)) AS roundtrip FROM t_log ORDER BY x
