statement
CREATE TABLE t_bit(a int, b int) USING parquet

statement
INSERT INTO t_bit VALUES (12, 10), (255, 0), (-1, 7), (NULL, 3)

query
SELECT a & b AS ba, a | b AS bo, ~a AS bn FROM t_bit ORDER BY a NULLS FIRST

-- negative-operand semantics: two's-complement throughout, and >> is
-- an ARITHMETIC shift (sign-extending); operator precedence & over |
query
SELECT -8 >> 1 AS arith_shift, -1 & 255 AS low_byte, 1 << 10 AS shl, 5 & 3 | 2 AS precedence

query
SELECT pi() AS pi_const, sign(0) AS sign_zero, sign(-0.0) AS sign_negzero
