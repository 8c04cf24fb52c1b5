statement
CREATE TABLE t_ul(s string) USING parquet

statement
INSERT INTO t_ul VALUES ('Hello'), ('WORLD'), ('mIxEd 123'), (NULL)

query
SELECT upper(s) AS u, lower(s) AS l FROM t_ul ORDER BY s NULLS FIRST
