statement
CREATE TABLE t_jl(id int, v string) USING parquet

statement
CREATE TABLE t_jr(id int, w string) USING parquet

statement
INSERT INTO t_jl VALUES (1, 'a'), (2, 'b'), (3, 'c'), (NULL, 'n')

statement
INSERT INTO t_jr VALUES (1, 'x'), (1, 'y'), (3, 'z'), (NULL, 'm')

query
SELECT l.id AS lid, l.v, r.w FROM t_jl l JOIN t_jr r ON l.id = r.id ORDER BY lid, w

query
SELECT l.id AS lid, l.v, r.w FROM t_jl l LEFT JOIN t_jr r ON l.id = r.id ORDER BY lid NULLS FIRST, w NULLS FIRST
