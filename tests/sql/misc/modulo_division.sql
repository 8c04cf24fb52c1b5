-- Sign semantics of % (truncation toward zero, sign follows dividend),
-- float-valued / on integers, NULL-propagating || concat.  `div`
-- (integer division keyword) is Spark-only spelling (DuckDB uses //).

query
SELECT -7 % 3 AS a, 7 % -3 AS b, -7 % -3 AS c, 7 % 3 AS d

query
SELECT 7 / 2 AS fdiv, -7 / 2 AS fdiv_neg

query
SELECT NULL || 'a' AS null_concat, 'x' || 'y' || 'z' AS chain

-- expect-rows: 1
query spark_only
SELECT 7 div 2 AS idiv, -7 div 2 AS idiv_neg WHERE 7 div 2 = 3 AND -7 div 2 = -3

-- expect-rows: 1
query spark_only
SELECT pmod(-7, 3) AS pm WHERE pmod(-7, 3) = 2
