-- mask(): class-based redaction — uppercase->X, lowercase->x,
-- digit->n by default, other characters kept; each class char is
-- overridable and NULL means keep-as-is
-- (reference: PII-masking coverage in the reference's string kernel
-- set, native/spark-expr string module).

statement
CREATE TABLE t_mask(s string) USING parquet

statement
INSERT INTO t_mask VALUES ('AbCd-123'), ('x'), (NULL)

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE mask('AbCd-123') = 'XxXx-nnn'
  AND mask('AbCd-123', 'Q', 'q', '9', '*') = 'QqQq*999'
  AND mask('123-456', '#') = 'nnn-nnn'

-- NULL override = keep that class unmasked
-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE mask('AbCd-123', NULL, NULL, NULL, NULL) = 'AbCd-123'
  AND mask('AbCd-123', NULL, 'x', NULL, NULL) = 'AxCx-123'
  AND mask('AbCd-123', 'X', 'x', NULL, NULL) = 'XxXx-123'

-- NULL input stays NULL; empty stays empty
-- expect-rows: 3
query spark_only
SELECT s, mask(s) AS m FROM t_mask ORDER BY s NULLS FIRST

-- expect-rows: 1
query spark_only
SELECT 1 AS ok
WHERE mask(NULL) IS NULL
  AND mask('') = ''
