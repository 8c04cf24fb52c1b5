-- Date-string parse forms both engines accept: trailing time
-- component dropped by the DATE cast, non-zero-padded components.

query
SELECT CAST('2020-03-05 10:11:12' AS DATE) AS with_time, CAST('2020-3-5' AS DATE) AS loose_pad

query
SELECT CAST('2024-02-29' AS DATE) AS leap_ok

-- invalid calendar date -> NULL under try_cast in both
query
SELECT try_cast('2023-02-29' AS DATE) AS bad_leap, try_cast('2020-13-01' AS DATE) AS bad_month
