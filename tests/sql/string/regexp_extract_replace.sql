-- regexp_extract / regexp_replace: the shared-regex subset where Java
-- and DuckDB RE2-style semantics agree (divergent classes are pinned in
-- tests/test_regex_compat.py; reference documents its own Java-vs-Rust
-- split in docs/source/user-guide/latest/compatibility/regex.md).

statement
CREATE TABLE t_re(s string) USING parquet

statement
INSERT INTO t_re VALUES ('a1b22c333'), ('no-digits'), ('x9'), (NULL)

query
SELECT s, regexp_extract(s, '([0-9]+)', 1) AS first_num FROM t_re ORDER BY s NULLS FIRST

-- DIVERGENCE (documented): Spark regexp_replace replaces ALL
-- occurrences; DuckDB replaces only the FIRST unless the 'g' option
-- is passed.  Shared check uses a single-occurrence pattern; Spark's
-- replace-all default is pinned separately.
query
SELECT s, regexp_replace(s, '^[a-z]', '#') AS masked FROM t_re ORDER BY s NULLS FIRST

-- expect-rows: 1
query spark_only
SELECT regexp_replace('a1b22c333', '[0-9]+', '#') AS all_masked WHERE regexp_replace('a1b22c333', '[0-9]+', '#') = 'a#b#c#'

query
SELECT regexp_extract('2024-03-15', '([0-9]{4})-([0-9]{2})', 2) AS month_grp
