-- ANSI-mode datetime error matrix (reference:
-- sql-tests/expressions/datetime/make_date.sql, next_day.sql,
-- unix_timestamp.sql carry invalid rows; the raise side of their
-- contract).  Spark 4 ANSI default: constructor fields out of bounds,
-- unparseable strings, bad day-of-week names and malformed format
-- patterns all RAISE — each with its error class pinned — while
-- try_to_date / try_to_timestamp stay NULL.  All expect_error blocks
-- are Spark-only (engine-specific error taxonomy); valid-path
-- datetime behavior is the rest of this category.

-- Config: spark.sql.ansi.enabled=true

-- constructor field out of bounds: nonexistent calendar day, month 13,
-- hour 25 — dedicated error class
query expect_error=DATETIME_FIELD_OUT_OF_BOUNDS
SELECT make_date(2023, 2, 30)

query expect_error=DATETIME_FIELD_OUT_OF_BOUNDS
SELECT make_date(2023, 13, 1)

query expect_error=DATETIME_FIELD_OUT_OF_BOUNDS
SELECT make_timestamp(2023, 1, 1, 25, 0, 0)

-- seconds field has its own class (fraction must stay inside [0, 60])
query expect_error=INVALID_FRACTION_OF_SECOND
SELECT make_timestamp(2023, 1, 1, 12, 0, 60.5)

-- string->date: unparseable text and a nonexistent calendar day both
-- fail as CAST_INVALID_INPUT (to_date without a format IS a cast)
query expect_error=CAST_INVALID_INPUT
SELECT to_date('not-a-date')

query expect_error=CAST_INVALID_INPUT
SELECT CAST('not-a-date' AS DATE)

query expect_error=CAST_INVALID_INPUT
SELECT to_date('2023-02-30')

-- with an explicit format the parse failure class changes
query expect_error=CANNOT_PARSE_TIMESTAMP
SELECT unix_timestamp('bad', 'yyyy-MM-dd')

-- the format PATTERN itself is validated
query expect_error=INVALID_DATETIME_PATTERN
SELECT to_timestamp('2023-01-01', 'qqq-invalid')

-- next_day with an unknown day-of-week name
query expect_error=ILLEGAL_DAY_OF_WEEK
SELECT next_day(date'2023-01-01', 'xyz')

-- date arithmetic past year 9999 overflows the calendar range
query expect_error=range
SELECT date_add(date'9999-12-31', 1000000)

-- the try_ escapes are NULL, and in-range construction still works
-- (there is no try_make_date/try_make_timestamp in Spark 4.1 —
-- try_to_date/try_to_timestamp are the string-side escapes)
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE try_to_date('not-a-date') IS NULL
  AND try_to_date('2023-02-30') IS NULL
  AND try_to_timestamp('bad', 'yyyy-MM-dd') IS NULL
  AND make_date(2024, 2, 29) = date'2024-02-29'
  AND next_day(date'2023-01-01', 'Mon') = date'2023-01-02'
