statement
CREATE TABLE t_fl(id int) USING parquet

statement
CREATE TABLE t_fr(id int) USING parquet

statement
INSERT INTO t_fl VALUES (1), (2), (NULL)

statement
INSERT INTO t_fr VALUES (2), (3), (NULL)

query
SELECT l.id AS lid, r.id AS rid FROM t_fl l FULL OUTER JOIN t_fr r ON l.id = r.id ORDER BY lid NULLS FIRST, rid NULLS FIRST

query
SELECT count(*) AS n FROM t_fl CROSS JOIN t_fr
