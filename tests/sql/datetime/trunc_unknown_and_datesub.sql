-- DIVERGENCES (documented, Spark pinned):
--   * date_trunc with an unit Spark doesn't know ('decade') returns
--     NULL SILENTLY; DuckDB truncates to the decade.  A typo'd unit
--     string in Spark nulls the whole column — worth a loud pin.
--   * DATE - DATE is an INTERVAL in Spark but an integer day count in
--     DuckDB; datediff() is the portable spelling (COMPAT.md).

-- expect-rows: 1
query spark_only
SELECT date_trunc('decade', DATE '2027-05-05') AS d WHERE date_trunc('decade', DATE '2027-05-05') IS NULL

-- supported units stay non-NULL
query
SELECT CAST(date_trunc('year', DATE '2027-05-05') AS DATE) AS y, CAST(date_trunc('month', DATE '2027-05-05') AS DATE) AS m

-- expect-rows: 1
query spark_only
SELECT DATE '1969-07-20' - DATE '1969-07-01' AS iv WHERE DATE '1969-07-20' - DATE '1969-07-01' = INTERVAL '19' DAY
