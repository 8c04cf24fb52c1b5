-- Alias resolution: GROUP BY a select-list alias, HAVING referencing
-- an aggregate alias, conditional functions if/coalesce, string
-- comparison with trailing spaces (no CHAR padding semantics).

statement
CREATE TABLE t_ar(x int) USING parquet

statement
INSERT INTO t_ar VALUES (1), (2), (3), (4)

query
SELECT x % 2 AS par, count(*) AS n, sum(x) AS s FROM t_ar GROUP BY par ORDER BY par

query
SELECT x % 2 AS par, count(*) AS n FROM t_ar GROUP BY par HAVING n > 1 ORDER BY par

query
SELECT if(2 > 1, 'yes', 'no') AS i, coalesce(NULL, CAST(NULL AS int), 7) AS c

query
SELECT 'a' = 'a ' AS trailing_differs, 'a' < 'a ' AS space_sorts_after
