-- The default frame with ORDER BY is RANGE UNBOUNDED PRECEDING TO
-- CURRENT ROW — which includes ALL PEERS of the current order key —
-- while ROWS UNBOUNDED PRECEDING cuts mid-peer-group.  The subtlest
-- everyday window semantics split; both engines must agree on both.

statement
CREATE TABLE t_dfp(g string, k int, v int) USING parquet

statement
INSERT INTO t_dfp VALUES ('a', 1, 10), ('a', 1, 20), ('a', 2, 5), ('a', 2, 7), ('a', 3, 1), ('b', 1, 100)

-- the ROWS variant totally orders the frame (k, v): a ROWS cut over
-- an ORDER BY with ties is nondeterministic among peers — itself a
-- semantics point this file documents by avoiding it
query
SELECT g, k, v, sum(v) OVER (PARTITION BY g ORDER BY k) AS rng_peers, sum(v) OVER (PARTITION BY g ORDER BY k, v ROWS UNBOUNDED PRECEDING) AS rows_cut FROM t_dfp ORDER BY g, k, v

query
SELECT g, k, count(*) OVER (PARTITION BY g ORDER BY k) AS n_through_peers, rank() OVER (PARTITION BY g ORDER BY k) AS rk, dense_rank() OVER (PARTITION BY g ORDER BY k) AS drk, row_number() OVER (PARTITION BY g ORDER BY k, v) AS rn FROM t_dfp ORDER BY g, k, rn
