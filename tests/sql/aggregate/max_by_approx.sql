-- max_by / min_by (argmax/argmin) and approx_count_distinct.  The
-- HLL sketches differ between engines, so the approx comparison gets
-- a 5% tolerance (exact at these tiny cardinalities in practice).

statement
CREATE TABLE t_mb(g string, s string, v int) USING parquet

statement
INSERT INTO t_mb VALUES ('a', 'p', 1), ('a', 'q', 9), ('a', 'r', 5), ('b', 'x', 3), ('b', 'y', NULL)

query
SELECT g, max_by(s, v) AS best, min_by(s, v) AS worst FROM t_mb GROUP BY g ORDER BY g

query
SELECT max_by(g, v) AS overall FROM t_mb

query tolerance=0.05
SELECT approx_count_distinct(s) AS acd, count(DISTINCT s) AS exact FROM t_mb
