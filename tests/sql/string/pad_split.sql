statement
CREATE TABLE t_pad(s string) USING parquet

statement
INSERT INTO t_pad VALUES ('ab'), ('abcdef'), (NULL)

query
SELECT lpad(s, 5, '*') AS lp, rpad(s, 5, '-') AS rp, instr(s, 'b') AS sp FROM t_pad ORDER BY s NULLS FIRST
