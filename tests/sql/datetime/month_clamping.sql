-- End-of-month clamping in month arithmetic: Jan 31 + 1 month lands
-- on the last day of February, and the clamp does NOT round-trip
-- (Feb 29 + 12 months = Feb 28).  The interval sums are CAST AS DATE
-- because DuckDB widens date+INTERVAL to TIMESTAMP.  add_months /
-- months_between / next_day are Spark-only surface, value-pinned.

query
SELECT CAST(DATE '2020-01-31' + INTERVAL '1' MONTH AS DATE) AS clamp_feb, CAST(DATE '2020-02-29' + INTERVAL '12' MONTH AS DATE) AS leap_down, CAST(DATE '2020-03-31' - INTERVAL '1' MONTH AS DATE) AS back_clamp

query
SELECT date_add(DATE '2020-01-01', 30) AS plus30, date_add(DATE '2020-03-01', -1) AS minus1

-- expect-rows: 1
query spark_only
SELECT add_months(DATE '2020-01-31', 1) AS am WHERE add_months(DATE '2020-01-31', 1) = DATE '2020-02-29'

-- months_between of two month-ends is a whole number by rule
-- expect-rows: 1
query spark_only
SELECT months_between(DATE '2020-03-31', DATE '2020-02-29') AS mb WHERE months_between(DATE '2020-03-31', DATE '2020-02-29') = 1.0

-- expect-rows: 1
query spark_only
SELECT next_day(DATE '2020-03-05', 'Monday') AS nd WHERE next_day(DATE '2020-03-05', 'Monday') = DATE '2020-03-09'
