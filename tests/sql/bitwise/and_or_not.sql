statement
CREATE TABLE t_bit(a int, b int) USING parquet

statement
INSERT INTO t_bit VALUES (12, 10), (255, 0), (-1, 7), (NULL, 3)

query
SELECT a & b AS ba, a | b AS bo, ~a AS bn FROM t_bit ORDER BY a NULLS FIRST
