-- dayname/monthname exist in both engines but Spark abbreviates
-- ('Wed') while DuckDB spells in full ('Wednesday'); left(_, 3)
-- projects both onto the shared abbreviation.

statement
CREATE TABLE t_dmn(d date) USING parquet

statement
INSERT INTO t_dmn VALUES (DATE '2020-02-05'), (DATE '2021-12-31'), (DATE '2024-02-29'), (DATE '1999-01-01')

query
SELECT d, left(dayname(d), 3) AS dow, left(monthname(d), 3) AS mon FROM t_dmn ORDER BY d

query
SELECT d, dayofmonth(d) AS dom, dayofyear(d) AS doy FROM t_dmn ORDER BY d

-- DIVERGENCE (documented): Spark dayofweek is 1=Sunday..7=Saturday;
-- DuckDB dayofweek is 0=Sunday..6=Saturday.  Spark's convention
-- pinned on a known Friday (2021-12-31 -> 6).
-- expect-rows: 1
query spark_only
SELECT dayofweek(DATE '2021-12-31') AS dow WHERE dayofweek(DATE '2021-12-31') = 6
