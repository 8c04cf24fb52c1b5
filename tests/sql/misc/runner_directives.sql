-- Config: spark.sql.ansi.enabled=false
-- This file exercises the runner's directive surface itself: a
-- per-file Spark conf (LEGACY eval mode — the cast below would also
-- pass under ANSI, the point is the conf path executes and restores),
-- and a spark_only block with its required expect-rows pin.

statement
CREATE TABLE t_dir(v int, s string) USING parquet

statement
INSERT INTO t_dir VALUES (1, 'a'), (2, 'b'), (3, 'c')

query
SELECT cast(v AS smallint) AS v16, cast(v AS string) AS vs FROM t_dir ORDER BY v

-- murmur3 hash() exists only in Spark; rows pinned by count
-- expect-rows: 3
query spark_only
SELECT v, hash(s) AS h FROM t_dir ORDER BY v
