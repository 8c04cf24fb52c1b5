statement
CREATE TABLE t_cnt(i int, s string) USING parquet

statement
INSERT INTO t_cnt VALUES (1, 'x'), (1, 'y'), (2, NULL), (NULL, 'x'), (NULL, NULL)

query
SELECT count(*) AS c_star, count(i) AS c_i, count(s) AS c_s, count(DISTINCT i) AS c_di FROM t_cnt

query
SELECT s, count(*) AS n FROM t_cnt GROUP BY s ORDER BY n, s NULLS FIRST
