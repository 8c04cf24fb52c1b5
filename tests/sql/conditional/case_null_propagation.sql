statement
CREATE TABLE t_cnp(v int) USING parquet

statement
INSERT INTO t_cnp VALUES (1), (NULL), (3)

query
SELECT v, CASE WHEN v > 2 THEN 'big' WHEN v IS NULL THEN 'null' ELSE 'small' END AS c, CASE WHEN v IS NOT NULL THEN v * 2 END AS dbl FROM t_cnp ORDER BY v NULLS FIRST
