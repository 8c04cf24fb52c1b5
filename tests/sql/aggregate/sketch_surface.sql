-- Spark's sketch/bucket aggregate surface (DataSketches HLL,
-- width_bucket, approx_percentile, multi-arg COUNT DISTINCT,
-- * EXCEPT projection).  DuckDB has no equivalents, so each is
-- value-pinned spark_only — the estimate values below are exact at
-- these tiny cardinalities.

-- expect-rows: 1
query spark_only
SELECT hll_sketch_estimate(hll_sketch_agg(x)) AS e FROM (VALUES (1),(2),(3),(2)) t(x) HAVING hll_sketch_estimate(hll_sketch_agg(x)) = 3

-- expect-rows: 1
query spark_only
SELECT width_bucket(5.3, 0.0, 10.0, 5) AS wb, width_bucket(-1.0, 0.0, 10.0, 5) AS below, width_bucket(11.0, 0.0, 10.0, 5) AS above WHERE width_bucket(5.3, 0.0, 10.0, 5) = 3 AND width_bucket(-1.0, 0.0, 10.0, 5) = 0 AND width_bucket(11.0, 0.0, 10.0, 5) = 6

-- expect-rows: 1
query spark_only
SELECT count(DISTINCT x, y) AS c FROM (VALUES (1,1),(1,1),(1,2),(NULL,1)) t(x,y) HAVING count(DISTINCT x, y) = 2

-- expect-rows: 1
query spark_only
SELECT approx_percentile(x, 0.5) AS ap FROM (VALUES (1),(2),(3),(4),(5)) t(x) HAVING approx_percentile(x, 0.5) = 3

-- expect-rows: 1
query spark_only
SELECT * EXCEPT (y) FROM (VALUES (7, 8)) t(x, y) WHERE x = 7

-- bround: Spark's half-even banker's rounding
-- expect-rows: 1
query spark_only
SELECT bround(2.5) AS b1, bround(3.5) AS b2 WHERE bround(2.5) = 2 AND bround(3.5) = 4
