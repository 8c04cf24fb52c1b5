-- LATERAL + ungrouped aggregate over an EMPTY correlated input.  An
-- ungrouped aggregate subquery always produces exactly one row (max
-- over nothing = NULL, count = 0), so Spark's comma-LATERAL emits
-- every outer row — childless outers get the NULL/0 row — per the
-- standard's scalar-aggregate semantics.  DuckDB decorrelates the
-- same comma-LATERAL into a grouped join and DROPS childless outer
-- rows ([(1, 20)] where Spark gives [(1, 20), (2, NULL)]); its
-- LEFT JOIN LATERAL ... ON TRUE spelling restores the Spark answer.
-- SILENT divergence (row count changes, no error) — COMPAT.md
-- Functions table.  lateral_correlated.sql keeps every outer key
-- matched, which is exactly why it differentials cleanly; this file
-- pins the childless case Spark-only.

statement
CREATE TABLE t_lat_child(k int, x int) USING parquet

statement
INSERT INTO t_lat_child VALUES (1, 10), (1, 20), (3, 7)

-- differential: every outer key has children — engines agree
query
SELECT o.k, t.m, t.c
FROM (SELECT DISTINCT k FROM t_lat_child) o,
LATERAL (SELECT max(c.x) AS m, count(*) AS c
         FROM t_lat_child c WHERE c.k = o.k) t
ORDER BY o.k

-- Spark pins: the childless outer row survives with a NULL max and
-- count 0 — one row per outer, unconditionally
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE (SELECT count(*) FROM (VALUES (1), (2)) o(k),
       LATERAL (SELECT max(c.x) AS m FROM t_lat_child c WHERE c.k = o.k) t) = 2
  AND (SELECT count(*) FROM (VALUES (1), (2)) o(k),
       LATERAL (SELECT max(c.x) AS m FROM t_lat_child c WHERE c.k = o.k) t
       WHERE o.k = 2 AND t.m IS NULL) = 1
