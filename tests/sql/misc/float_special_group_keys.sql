-- Float special values AS KEYS: -0.0 and NaN in GROUP BY / DISTINCT /
-- join keys.  Spark's NormalizeFloatingNumbers rule canonicalizes
-- -0.0 to 0.0 and all NaN bit patterns to one NaN before any keyed
-- operator precisely so these behave set-like (SPARK-26021); DuckDB
-- arrives at the same answers independently, so the whole class is
-- differential — an engine that keyed raw IEEE bits would split the
-- -0.0/0.0 group and leak two NaN groups.  ORDER BY places NaN LAST
-- ascending (after +Inf) in both engines.

-- -0.0 and 0.0 are ONE group; two NaNs (different expressions) are
-- ONE group and count 1 distinct
query
SELECT count(*) AS rows_in, count(DISTINCT v) AS dist
FROM (VALUES (CAST(0.0 AS DOUBLE)), (CAST(-0.0 AS DOUBLE)),
             (CAST('NaN' AS DOUBLE)), (CAST('NaN' AS DOUBLE) * 2)) t(v)

query
SELECT v, count(*) AS n
FROM (VALUES (CAST(0.0 AS DOUBLE)), (CAST(-0.0 AS DOUBLE))) t(v)
GROUP BY v

-- NaN equi-joins with itself once normalized
query
SELECT count(*) AS n
FROM (VALUES (CAST('NaN' AS DOUBLE))) a(v)
JOIN (VALUES (CAST('NaN' AS DOUBLE))) b(v) ON a.v = b.v

-- total order: NaN sorts above +Infinity in both engines
query
SELECT v FROM (VALUES (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)), (1.0)) t(v)
ORDER BY v DESC LIMIT 1
