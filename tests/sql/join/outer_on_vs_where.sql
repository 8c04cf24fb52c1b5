-- The classic outer-join trap: a filter on the RIGHT side belongs in
-- the ON clause (rows survive with NULLs) vs the WHERE clause (the
-- join silently becomes inner).  Both engines must agree on both
-- spellings.

statement
CREATE TABLE t_ow_l(k int, lv string) USING parquet

statement
CREATE TABLE t_ow_r(k int, rv int) USING parquet

statement
INSERT INTO t_ow_l VALUES (1, 'a'), (2, 'b'), (3, 'c')

statement
INSERT INTO t_ow_r VALUES (1, 10), (2, 3), (3, 30)

-- predicate in ON: every left row survives
query
SELECT l.k, l.lv, r.rv FROM t_ow_l l LEFT JOIN t_ow_r r ON l.k = r.k AND r.rv > 5 ORDER BY l.k

-- same predicate in WHERE: NULL-extended rows are filtered out
query
SELECT l.k, l.lv, r.rv FROM t_ow_l l LEFT JOIN t_ow_r r ON l.k = r.k WHERE r.rv > 5 ORDER BY l.k

-- predicate on the LEFT side in ON of a LEFT join: left rows STILL
-- survive (only the match condition is affected)
query
SELECT l.k, l.lv, r.rv FROM t_ow_l l LEFT JOIN t_ow_r r ON l.k = r.k AND l.k <> 2 ORDER BY l.k

query
SELECT l.k, r.rv FROM t_ow_l l FULL JOIN t_ow_r r ON l.k = r.k AND r.rv >= 10 ORDER BY l.k NULLS LAST, r.rv NULLS LAST
