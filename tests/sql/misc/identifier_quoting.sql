-- Identifier resolution and quoting.  Case-insensitive column
-- resolution and OFFSET-without-LIMIT are shared.  DIVERGENCE
-- (documented): double quotes are a STRING LITERAL in Spark's default
-- dialect but an IDENTIFIER in DuckDB/ANSI — the single most common
-- silent port bug when moving warehouse SQL; Spark's identifier quote
-- is the backtick.  FETCH FIRST n ROWS ONLY is not in Spark's grammar
-- (LIMIT is the spelling).

statement
CREATE TABLE t_iq(a int, b string) USING parquet

statement
INSERT INTO t_iq VALUES (1, 'x'), (2, 'y'), (3, 'z')

-- unquoted identifiers resolve case-insensitively in both
query
SELECT A, B FROM t_iq ORDER BY a

query
SELECT x FROM (VALUES (1 + 1), (2 * 3)) t(x) ORDER BY x

query
SELECT a FROM t_iq ORDER BY a OFFSET 1

-- Spark: "..." is a string literal, `...` is the identifier quote
-- expect-rows: 1
query spark_only
SELECT "hello" AS s WHERE "hello" = 'hello'

-- expect-rows: 3
query spark_only
SELECT `a` AS backtick_ident FROM t_iq ORDER BY `a`
