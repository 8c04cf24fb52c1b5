-- grouping() marker columns over ROLLUP/CUBE — distinguishes the
-- super-aggregate NULL from a data NULL (reference: Expand operator's
-- grouping-id emission).

statement
CREATE TABLE t_gf(r string, n string, v int) USING parquet

statement
INSERT INTO t_gf VALUES ('eu', 'de', 1), ('eu', 'fr', 2), ('us', NULL, 4), ('us', 'ca', 8)

query
SELECT grouping(r) AS gr, grouping(n) AS gn, r, n, sum(v) AS s FROM t_gf GROUP BY ROLLUP(r, n) ORDER BY gr, gn, r NULLS FIRST, n NULLS FIRST

query
SELECT grouping(r) AS gr, grouping(n) AS gn, r, n, sum(v) AS s FROM t_gf GROUP BY CUBE(r, n) ORDER BY gr, gn, r NULLS FIRST, n NULLS FIRST

-- the data NULL ('us', NULL) keeps grouping(n)=0 at the detail level
query
SELECT r, n, grouping(n) AS gn, sum(v) AS s FROM t_gf GROUP BY GROUPING SETS ((r, n)) HAVING grouping(n) = 0 AND n IS NULL ORDER BY r
