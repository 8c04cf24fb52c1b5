-- NULL and NaN as join/partition keys: NaN JOINS WITH NaN (the SQL
-- NaN-equality convention carries into equi-join keys — the
-- reference's join kernels special-case this on IEEE hardware);
-- NULL keys never equi-match but DO form one window partition and
-- one null-safe (IS NOT DISTINCT FROM) match group.

statement
CREATE TABLE t_njk_a(g string, x double) USING parquet

statement
CREATE TABLE t_njk_b(g string, x double) USING parquet

statement
INSERT INTO t_njk_a VALUES ('a', CAST('NaN' AS DOUBLE)), ('b', 1.0), ('n', NULL)

statement
INSERT INTO t_njk_b VALUES ('p', CAST('NaN' AS DOUBLE)), ('q', 2.0), ('m', NULL)

-- NaN = NaN matches; NULL keys match nothing
query
SELECT a.g AS ag, b.g AS bg FROM t_njk_a a JOIN t_njk_b b ON a.x = b.x ORDER BY ag

-- null-safe join: NULL-NULL now matches too
query
SELECT a.g AS ag, b.g AS bg FROM t_njk_a a JOIN t_njk_b b ON a.x IS NOT DISTINCT FROM b.x ORDER BY ag

-- NULL forms ONE window partition
query
SELECT g, x, count(*) OVER (PARTITION BY x) AS part_n FROM t_njk_a ORDER BY g

-- upper() normalizes the NaN rendering (Spark 'NaN' vs DuckDB 'nan' —
-- one more cast-rendering divergence, noted in COMPAT.md)
query
SELECT upper(coalesce(CAST(x AS STRING), 'null-key')) AS k, count(*) AS n FROM t_njk_a GROUP BY upper(coalesce(CAST(x AS STRING), 'null-key')) ORDER BY k
