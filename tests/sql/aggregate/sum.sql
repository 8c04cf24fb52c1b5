-- ported from reference expressions/aggregate/sum.sql (NULL group,
-- int64 edges kept; the Infinity row is exercised in sum_float)
statement
CREATE TABLE t_sum(i int, l long, grp string) USING parquet

statement
INSERT INTO t_sum VALUES (1, 10, 'a'), (2, 20, 'a'), (3, 30, 'b'), (NULL, NULL, 'b'), (2147483647, 922337203685477580, 'c')

query
SELECT sum(i) AS si, sum(l) AS sl FROM t_sum

query
SELECT grp, sum(i) AS si FROM t_sum GROUP BY grp ORDER BY grp

query
SELECT sum(i) FILTER (WHERE grp = 'a') AS sa FROM t_sum
