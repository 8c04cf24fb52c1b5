-- log with an explicit base: exact powers must be BIT-exact doubles
-- (no tolerance) on both engines, and out-of-domain bases follow
-- Spark's null-on-domain-error contract
-- (reference: sql-tests/expressions/math/{log,log2,log10}.sql).

statement
CREATE TABLE t_logb(x double, b double) USING parquet

statement
INSERT INTO t_logb VALUES (1024.0, 2.0), (243.0, 3.0), (1.0, 7.0)

-- differential, exact: log(base, x) at these powers is bit-exact on
-- both engines (base 10 deliberately excluded — see the divergence
-- pin below)
query
SELECT log(b, x) AS lb FROM t_logb ORDER BY x

-- DOCUMENTED DIVERGENCE (found by this file's first draft): Spark
-- computes log(b, x) as the naive ln(x)/ln(b) ratio, so
-- log(10, 1e6) = 5.999999999999999 — one ULP under — while the
-- SPECIALIZED log10 spelling is exactly 6.0 (and DuckDB's log(10, x)
-- is exact too).  Pin both spellings so a Spark upgrade that fixes
-- the ratio fails loudly here.
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE log(10, cast(1000000 as double)) < cast(6.0 as double)
  AND log10(cast(1000000 as double)) = cast(6.0 as double)

query
SELECT log2(cast(1024 as double)) AS l2,
       log10(cast(1000000 as double)) AS l10,
       ln(exp(cast(1 as double))) AS le

-- base edge cases are Spark-surface: base 1 divides by ln(1)=0 (IEEE
-- Infinity), base 0 / negative base are domain errors -> NULL
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE log(1, 5) = cast('Infinity' as double)
  AND log(0, 5) IS NULL
  AND log(-2, 8) IS NULL
  AND log(2, 0) IS NULL
  AND log(2, -4) IS NULL
  AND log(2, cast(NULL as double)) IS NULL
  AND log(cast(NULL as double), 8) IS NULL
