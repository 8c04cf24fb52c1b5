-- JOIN ... USING and NATURAL JOIN: coalesced key columns, shared
-- column-name resolution.

statement
CREATE TABLE t_ju_a(k int, a string) USING parquet

statement
CREATE TABLE t_ju_b(k int, b string) USING parquet

statement
INSERT INTO t_ju_a VALUES (1, 'a1'), (2, 'a2'), (3, 'a3')

statement
INSERT INTO t_ju_b VALUES (2, 'b2'), (3, 'b3'), (4, 'b4')

query
SELECT k, a, b FROM t_ju_a JOIN t_ju_b USING (k) ORDER BY k

query
SELECT k, a, b FROM t_ju_a LEFT JOIN t_ju_b USING (k) ORDER BY k

query
SELECT k, a, b FROM t_ju_a FULL JOIN t_ju_b USING (k) ORDER BY k

query
SELECT k, a, b FROM t_ju_a NATURAL JOIN t_ju_b ORDER BY k
