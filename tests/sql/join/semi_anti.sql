statement
CREATE TABLE t_sl(id int, v string) USING parquet

statement
CREATE TABLE t_sr(id int) USING parquet

statement
INSERT INTO t_sl VALUES (1, 'a'), (2, 'b'), (3, 'c')

statement
INSERT INTO t_sr VALUES (2), (3), (4)

query
SELECT id, v FROM t_sl WHERE id IN (SELECT id FROM t_sr) ORDER BY id

query
SELECT id, v FROM t_sl WHERE NOT EXISTS (SELECT 1 FROM t_sr WHERE t_sr.id = t_sl.id) ORDER BY id

-- explicit SEMI / ANTI JOIN grammar (both engines accept the bare
-- forms; Spark also spells LEFT SEMI / LEFT ANTI)
query
SELECT l.id FROM t_sl l SEMI JOIN t_sr r ON r.id = l.id ORDER BY l.id

query
SELECT l.id FROM t_sl l ANTI JOIN t_sr r ON r.id = l.id ORDER BY l.id
