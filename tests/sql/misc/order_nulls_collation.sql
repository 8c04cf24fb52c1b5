statement
CREATE TABLE t_onc(v int, s string) USING parquet

statement
INSERT INTO t_onc VALUES (3, 'b'), (NULL, 'a'), (1, NULL), (2, 'B')

query
SELECT v, s FROM t_onc ORDER BY v ASC NULLS FIRST, s

query
SELECT v, s FROM t_onc ORDER BY v DESC NULLS LAST, s
