-- Column DEFAULT values on parquet tables: omitted-column INSERTs and
-- the DEFAULT keyword fill from the declaration (differential — both
-- engines implement standard defaults), and ALTER TABLE ADD COLUMN
-- with a DEFAULT back-fills rows written BEFORE the column existed
-- (Spark's parquet "existence default": the files have no such
-- column, the value materializes at read time)
-- (reference: sql-tests/expressions/misc/parquet_default_values.sql).

statement
CREATE TABLE t_defaults(a int, b int DEFAULT 42, c string DEFAULT 'x') USING parquet

statement
INSERT INTO t_defaults(a) VALUES (1)

statement
INSERT INTO t_defaults VALUES (2, DEFAULT, DEFAULT)

statement
INSERT INTO t_defaults VALUES (3, 7, 'y')

query
SELECT a, b, c FROM t_defaults ORDER BY a

-- existence default: d did not exist when rows 1-3 were written;
-- reading them materializes -1 without rewriting any parquet file
statement
ALTER TABLE t_defaults ADD COLUMN d int DEFAULT -1

statement
INSERT INTO t_defaults VALUES (4, 8, 'z', 9)

query
SELECT a, b, c, d FROM t_defaults ORDER BY a

-- defaults compose with expressions over the filled values
query
SELECT sum(b) AS sum_b, count(*) AS n FROM t_defaults WHERE d = -1
