-- Bitwise AGGREGATES (bit_and / bit_or / bit_xor) — shared by both
-- engines, differential.

statement
CREATE TABLE t_bag(g string, v int) USING parquet

statement
INSERT INTO t_bag VALUES ('a', 7), ('a', 3), ('a', 5), ('b', 12), ('b', 10), ('c', NULL)

query
SELECT g, bit_and(v) AS ba, bit_or(v) AS bo, bit_xor(v) AS bx FROM t_bag GROUP BY g ORDER BY g

query
SELECT bit_and(v) AS ba, bit_or(v) AS bo, bit_xor(v) AS bx FROM t_bag

-- NULLs are skipped; all-NULL group yields NULL
query
SELECT g, bit_and(v) AS ba FROM t_bag WHERE g = 'c' GROUP BY g
