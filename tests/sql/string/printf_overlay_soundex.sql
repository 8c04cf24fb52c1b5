-- printf is shared; overlay / soundex / format_string are Spark surface
-- pinned by value filters (reference covers these in its string kernel:
-- native/spark-expr string functions).

-- the float arg is cast: Spark parses 3.14159 as a DECIMAL literal,
-- which java.util.Formatter's %f rejects
query
SELECT printf('%d-%s', 7, 'x') AS a, printf('%.2f', CAST(3.14159 AS double)) AS b

-- expect-rows: 1
query spark_only
SELECT overlay('hello', 'XX', 2) AS o WHERE overlay('hello', 'XX', 2) = 'hXXlo'

-- soundex maps phonetically-equal names to one code
-- expect-rows: 1
query spark_only
SELECT soundex('Robert') AS a WHERE soundex('Robert') = soundex('Rupert') AND soundex('Robert') = 'R163'

-- expect-rows: 1
query spark_only
SELECT format_string('%03d/%s', 7, 'ab') AS f WHERE format_string('%03d/%s', 7, 'ab') = '007/ab'
