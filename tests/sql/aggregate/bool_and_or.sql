statement
CREATE TABLE t_bool(b boolean, grp string) USING parquet

statement
INSERT INTO t_bool VALUES (true, 'a'), (false, 'a'), (true, 'b'), (NULL, 'b'), (NULL, 'c')

query
SELECT grp, bool_and(b) AS ba, bool_or(b) AS bo FROM t_bool GROUP BY grp ORDER BY grp
