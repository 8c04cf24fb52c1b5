-- hex / unhex / bin: numeric-to-text encodings shared by both engines.

statement
CREATE TABLE t_hx(v long) USING parquet

statement
INSERT INTO t_hx VALUES (0), (10), (255), (4095), (65536)

query
SELECT v, hex(v) AS h, bin(v) AS b FROM t_hx ORDER BY v

query
SELECT unhex('4142') AS bytes_ab, unhex('00FF') AS bytes_0ff

query
SELECT hex(255) AS hu, bin(10) AS b10
