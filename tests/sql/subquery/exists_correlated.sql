-- Correlated EXISTS / NOT EXISTS — planned as LeftSemi / LeftAnti
-- (the reference lowers these through its HashJoin semi/anti modes).

statement
CREATE TABLE t_ex_o(ok int, cust string) USING parquet

statement
CREATE TABLE t_ex_l(ok int, amt int) USING parquet

statement
INSERT INTO t_ex_o VALUES (1, 'a'), (2, 'b'), (3, 'a'), (4, 'c')

statement
INSERT INTO t_ex_l VALUES (1, 10), (1, 20), (3, 5), (5, 99)

query
SELECT ok, cust FROM t_ex_o o WHERE EXISTS (SELECT 1 FROM t_ex_l l WHERE l.ok = o.ok) ORDER BY ok

query
SELECT ok, cust FROM t_ex_o o WHERE NOT EXISTS (SELECT 1 FROM t_ex_l l WHERE l.ok = o.ok) ORDER BY ok

query
SELECT ok, cust FROM t_ex_o o WHERE EXISTS (SELECT 1 FROM t_ex_l l WHERE l.ok = o.ok AND l.amt > 15) ORDER BY ok

-- nested correlation through an aggregate
query
SELECT ok FROM t_ex_o o WHERE EXISTS (SELECT 1 FROM t_ex_l l WHERE l.ok = o.ok GROUP BY l.ok HAVING sum(l.amt) > 10) ORDER BY ok
