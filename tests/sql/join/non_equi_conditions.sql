-- Non-equi and expression joins: range conditions (planned as
-- nested-loop / range join), modulo-expression equi keys, explicit
-- CROSS JOIN.

statement
CREATE TABLE t_ne_a(k int, v int) USING parquet

statement
CREATE TABLE t_ne_b(k int, w int) USING parquet

statement
INSERT INTO t_ne_a VALUES (1, 10), (2, 20), (3, 30)

statement
INSERT INTO t_ne_b VALUES (1, 15), (2, 25), (4, 5)

query
SELECT a.k AS ak, b.k AS bk FROM t_ne_a a JOIN t_ne_b b ON a.v < b.w ORDER BY ak, bk

query
SELECT a.k AS ak, b.k AS bk FROM t_ne_a a JOIN t_ne_b b ON a.k % 2 = b.k % 2 ORDER BY ak, bk

query
SELECT a.k AS ak, b.k AS bk FROM t_ne_a a CROSS JOIN t_ne_b b ORDER BY ak, bk

-- band join: |v - w| within 6
query
SELECT a.k AS ak, b.k AS bk, a.v, b.w FROM t_ne_a a JOIN t_ne_b b ON a.v BETWEEN b.w - 6 AND b.w + 6 ORDER BY ak, bk
