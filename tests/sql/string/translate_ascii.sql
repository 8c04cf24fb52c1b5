statement
CREATE TABLE t_tr(s string) USING parquet

statement
INSERT INTO t_tr VALUES ('abcabc'), ('xyz'), ('A')

query
SELECT translate(s, 'abc', '123') AS tr, ascii(s) AS a, chr(ascii(s) + 1) AS nxt FROM t_tr ORDER BY s
