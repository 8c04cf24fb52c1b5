-- make_date / make_timestamp constructors, EXTRACT fields from
-- timestamps, and timestamp +/- INTERVAL arithmetic.

query
SELECT make_date(2020, 3, 5) AS d, make_date(2024, 2, 29) AS leap

query
SELECT make_timestamp(2020, 3, 5, 12, 30, 45) AS ts

query
SELECT EXTRACT(HOUR FROM TIMESTAMP '2020-03-05 12:30:45') AS h, EXTRACT(MINUTE FROM TIMESTAMP '2020-03-05 12:30:45') AS m, EXTRACT(YEAR FROM TIMESTAMP '2020-03-05 12:30:45') AS y

query
SELECT TIMESTAMP '2020-03-05 10:00:00' + INTERVAL '90' MINUTE AS plus90m, TIMESTAMP '2020-03-05 10:00:00' - INTERVAL '2' HOUR AS minus2h

query
SELECT CAST(TIMESTAMP '2020-03-05 12:00:00' AS DATE) AS to_date_cast, CAST(DATE '2020-03-05' AS TIMESTAMP) AS to_ts_cast
