-- Unicode semantics: length counts CODEPOINTS (not bytes), substr
-- addresses codepoints, case-mapping handles accents; trim with the
-- ANSI BOTH/LEADING/TRAILING ... FROM grammar.

statement
CREATE TABLE t_uni(s string) USING parquet

statement
INSERT INTO t_uni VALUES ('héllo'), ('日本語テキスト'), ('ÀÉÎÕÜ'), ('mixed日本abc')

query
SELECT s, length(s) AS cp_len FROM t_uni ORDER BY s

query
SELECT s, upper(s) AS u, lower(s) AS lo FROM t_uni ORDER BY s

query
SELECT s, reverse(s) AS r, substr(s, 2, 3) AS mid FROM t_uni ORDER BY s

query
SELECT trim(BOTH 'x' FROM 'xxhixx') AS tb, trim(LEADING 'x' FROM 'xxhi') AS tl, trim(TRAILING 'x' FROM 'hixx') AS tt
