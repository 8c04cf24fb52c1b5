-- substring position-0 / negative edges.  Spark's rule
-- (UTF8String.substringSQL): the window is [pos, pos+len) with
-- pos 0 aliased to 1 (the length budget is NOT consumed by the
-- phantom position), a negative pos counted from the end may place
-- the window entirely off-string (substring('ab', -7, 3) = '' —
-- the budget IS consumed off-string), and a negative length is the
-- empty string.  DuckDB differs on all three (substr('hello',0,3) =
-- 'he', substr('ab',-7,3) = 'ab', substr('hello',2,-1) = 'h'), so
-- those rows are Spark-only pins (COMPAT.md Functions table); the
-- in-range negative-start rows both engines agree on stay
-- differential.
-- (reference: substring kernels in native/spark-expr strings module)

statement
CREATE TABLE t_subz(s string) USING parquet

statement
INSERT INTO t_subz VALUES ('hello'), ('ab'), (''), (NULL)

-- differential: in-range negative start counts from the end in both
-- engines, and pos 0 with NO length is the whole string in both
query
SELECT s,
       substring(s, -2, 3) AS tail2,
       substring(s, 0) AS from_zero
FROM t_subz ORDER BY s NULLS FIRST

-- Spark pins: pos 0 == pos 1 with the full length budget; an
-- overshooting negative start consumes the budget off-string; a
-- negative length is empty, never an error
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE substring('hello', 0, 3) = 'hel'
  AND substring('hello', 1, 3) = 'hel'
  AND substring('hello', -7, 3) = 'h'
  AND substring('ab', -7, 3) = ''
  AND substring('hello', 2, -1) = ''
  AND substring('hello', -2, 100) = 'lo'
  AND substring('', 0, 3) = ''
