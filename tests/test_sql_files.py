"""SQL-file test corpus runner (round-3 verdict item 4).

Rebuild of the reference's sqllogictest-like layer
(reference: spark/src/test/scala/org/apache/comet/CometSqlFileTestSuite
via docs/source/contributor-guide/sql-file-tests.md; corpus under
spark/src/test/resources/sql-tests/expressions/** — 176 files).  The
reference runs each query through Spark and Comet and diffs; here the
second engine is DuckDB, so a `query` block is a differential check of
the SAME SQL text on both engines.

File format (tests/sql/**/*.sql), same shape as the reference's:

  -- Config: spark.sql.ansi.enabled=false     (per-file Spark confs)
  statement
  CREATE TABLE t(i int, s string) USING parquet
  statement
  INSERT INTO t VALUES (1, 'a'), (NULL, NULL)
  query [tolerance=1e-6] [spark_only]
  SELECT sum(i) FROM t

Blocks are separated by blank lines; `statement` blocks run on both
engines (CREATE TABLE type names are rewritten for DuckDB: long →
BIGINT, string → VARCHAR, binary → BLOB, `USING parquet` dropped);
`query` blocks run on both and rows are compared order-insensitively
unless the query has an ORDER BY (then order-sensitively).
`tolerance=X` compares floats within X.  `spark_only` executes on
Spark alone — for surface DuckDB can't express — and requires an
`-- expect-rows: N` directive on the block so it still asserts
something real.  `expect_error[=REGEX]` asserts the Spark-side
execution RAISES (error message matching REGEX, case-insensitive) —
the reference's `query expect_error(ERROR_CLASS)` directive from its
`*_ansi.sql` files; Spark-only by construction since error classes
are engine-specific.

Adding coverage = dropping a .sql file in tests/sql/<category>/; no
Python changes needed.
"""

from __future__ import annotations

import math
import os
import re
from decimal import Decimal
from fractions import Fraction
from pathlib import Path

import duckdb
import pytest

SQL_DIR = Path(__file__).parent / "sql"

# Spark -> DuckDB type-name rewrites applied to `statement` blocks only
_TYPE_REWRITES = [
    (re.compile(r"\blong\b", re.I), "BIGINT"),
    (re.compile(r"\bshort\b", re.I), "SMALLINT"),
    (re.compile(r"\bstring\b", re.I), "VARCHAR"),
    (re.compile(r"\bbinary\b", re.I), "BLOB"),
    (re.compile(r"\bUSING\s+parquet\b", re.I), ""),
]


def _duckify(stmt: str) -> str:
    # Rewrite only OUTSIDE single-quoted string literals: a data value
    # like 'a string value' in an INSERT must not become 'a VARCHAR
    # value' on the DuckDB side.  Literals are split out first ('' is
    # the SQL escape for a quote inside a literal, handled by the
    # non-greedy pair match), rewrites apply to the code segments only.
    parts = re.split(r"('(?:[^']|'')*')", stmt)
    for i in range(0, len(parts), 2):  # even indexes = non-literal code
        for pat, rep in _TYPE_REWRITES:
            parts[i] = pat.sub(rep, parts[i])
    return "".join(parts)


class Block:
    def __init__(self, kind: str, sql: str, args: dict):
        self.kind, self.sql, self.args = kind, sql, args


def parse_sql_file(path: Path):
    """Return (configs: dict, blocks: list[Block])."""
    configs: dict[str, str] = {}
    blocks: list[Block] = []
    chunks = re.split(r"\n\s*\n", path.read_text())
    for chunk in chunks:
        lines = [ln for ln in chunk.splitlines() if ln.strip()]
        if not lines:
            continue
        pending_expect = None
        while lines and lines[0].lstrip().startswith("--"):
            c = lines.pop(0).lstrip()[2:].strip()
            m = re.match(r"Config:\s*([\w.]+)=(\S+)", c)
            if m:
                configs[m.group(1)] = m.group(2)
            m = re.match(r"expect-rows:\s*(\d+)", c)
            if m:
                pending_expect = int(m.group(1))
        if not lines:
            continue
        raw_head = lines[0].strip()
        head = raw_head.lower()
        if head == "statement":
            blocks.append(Block("statement", "\n".join(lines[1:]), {}))
        elif head.startswith("query"):
            args: dict = {}
            # `query expect_error[=REGEX]`: the Spark-side execution
            # must RAISE (optionally matching REGEX, case-insensitive).
            # Spark-only by construction — error classes/messages are
            # engine-specific (reference: sql-tests/expressions/math/
            # arithmetic_ansi.sql's `query expect_error(...)`).
            # Parsed from the RAW line (not the whitespace-split lowered
            # tokens) so the regex may contain spaces and keeps its case.
            m = re.search(
                r"(?<![\w])expect_error(?:=(.*))?$", raw_head, re.I
            )
            # Tokenize only the part BEFORE the expect_error directive:
            # its REGEX payload may itself contain words like
            # 'tolerance=' or 'spark_only' that must not be parsed as
            # directives (ADVICE r6).
            tok_head = (raw_head[: m.start()] if m else raw_head).lower()
            for tok in tok_head.split()[1:]:
                if tok.startswith("tolerance="):
                    args["tolerance"] = float(tok.split("=", 1)[1])
                elif tok == "spark_only":
                    args["spark_only"] = True
                elif tok.startswith("expect_error"):
                    assert m is not None, (
                        f"{path.name}: malformed expect_error directive "
                        f"(did you mean `expect_error` or "
                        f"`expect_error=REGEX`?): {raw_head}"
                    )
            if m is not None:
                args["expect_error"] = (m.group(1) or "").strip()
            if pending_expect is not None:
                args["expect_rows"] = pending_expect
            blocks.append(Block("query", "\n".join(lines[1:]), args))
        # anything else in a chunk (pure comments) is ignored
    return configs, blocks


def _canon(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, Decimal):
        return v
    return v


def _row_key(row):
    return tuple(
        (x is None, type(x).__name__, str(x)) for x in row
    )


def _rows_equal(a, b, tol: float | None) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not None or y is not None:
                return False
            continue
        fx = isinstance(x, (float, int, Decimal)) and not isinstance(
            x, bool
        )
        fy = isinstance(y, (float, int, Decimal)) and not isinstance(
            y, bool
        )
        if fx and fy:
            # int/Decimal pairs compare EXACTLY on the native types —
            # routing them through float() would equate any two values
            # above 2^53 that round to the same double (factorials, bit
            # aggregates, decimal(38,18) pins), masking exactly the
            # divergence class this corpus exists to catch.  isclose
            # applies only when a float is involved, and only with a
            # nonzero tolerance when the query declares tolerance=X.
            if not (isinstance(x, float) or isinstance(y, float)):
                if x != y:
                    return False
                continue
            xf, yf = float(x), float(y)
            if math.isnan(xf) or math.isnan(yf):
                if not (math.isnan(xf) and math.isnan(yf)):
                    return False
                continue
            if tol is not None:
                if not math.isclose(xf, yf, rel_tol=tol, abs_tol=tol):
                    return False
            else:
                # Exactly one side is a float and no tolerance was
                # declared: compare exactly as rationals (every finite
                # float has an exact rational value) — float(int) on
                # the other side would equate BIGINT 2**53+1 with
                # double 2**53, reopening the >2^53 aliasing hole the
                # exact int/Decimal path above closes.
                if math.isinf(xf) or math.isinf(yf):
                    if xf != yf:
                        return False
                    continue
                if Fraction(x) != Fraction(y):
                    return False
        elif _canon(x) != _canon(y):
            return False
    return True


def _tables_in(stmt: str) -> list[str]:
    return re.findall(
        r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)", stmt, re.I
    )


_FILES = sorted(SQL_DIR.rglob("*.sql")) if SQL_DIR.exists() else []


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@pytest.mark.parametrize(
    "path", _FILES, ids=[str(p.relative_to(SQL_DIR)) for p in _FILES]
)
def test_sql_file(spark, duck, path):
    configs, blocks = parse_sql_file(path)
    saved = {}
    tables: list[str] = []
    for k, v in configs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        n_queries = 0
        for blk in blocks:
            if blk.kind == "statement":
                tables.extend(_tables_in(blk.sql))
                spark.sql(blk.sql)
                duck.execute(_duckify(blk.sql))
                continue
            n_queries += 1
            if "expect_error" in blk.args:
                with pytest.raises(Exception) as ei:
                    spark.sql(blk.sql).collect()
                pat = blk.args["expect_error"]
                if pat:
                    assert re.search(pat, str(ei.value), re.I), (
                        f"{path.name}: error did not match /{pat}/i:\n"
                        f"{ei.value}\nquery: {blk.sql}"
                    )
                else:
                    # A bare `expect_error` accepts any RUNTIME error,
                    # but a typo'd table/column or bad syntax must not
                    # make the block pass for the wrong reason.
                    unrelated = (
                        "TABLE_OR_VIEW_NOT_FOUND",
                        "UNRESOLVED_COLUMN",
                        "UNRESOLVED_ROUTINE",
                        "PARSE_SYNTAX_ERROR",
                        "COLUMN_NOT_FOUND",
                    )
                    msg = str(ei.value)
                    assert not any(u in msg for u in unrelated), (
                        f"{path.name}: bare expect_error caught an "
                        f"analysis/parse failure (fix the query or "
                        f"give an explicit pattern):\n{msg}\n"
                        f"query: {blk.sql}"
                    )
                continue
            srows = [
                tuple(_canon(v) for v in r)
                for r in spark.sql(blk.sql).collect()
            ]
            if blk.args.get("spark_only"):
                exp = blk.args.get("expect_rows")
                assert exp is not None, (
                    f"{path.name}: spark_only query needs -- expect-rows"
                )
                assert len(srows) == exp, (
                    f"{path.name}: expected {exp} rows, got {len(srows)}"
                )
                continue
            orows = [
                tuple(_canon(v) for v in r)
                for r in duck.execute(blk.sql).fetchall()
            ]
            ordered = re.search(r"\border\s+by\b", blk.sql, re.I)
            if not ordered:
                srows = sorted(srows, key=_row_key)
                orows = sorted(orows, key=_row_key)
            assert len(srows) == len(orows), (
                f"{path.name}: row count {len(srows)} vs {len(orows)}\n"
                f"query: {blk.sql}"
            )
            tol = blk.args.get("tolerance")
            for i, (sr, orow) in enumerate(zip(srows, orows)):
                assert _rows_equal(sr, orow, tol), (
                    f"{path.name} row {i}: spark={sr!r} duck={orow!r}\n"
                    f"query: {blk.sql}"
                )
        assert n_queries > 0, f"{path.name}: no query blocks"
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            try:
                duck.execute(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_corpus_is_seeded():
    """The corpus must hold at least the 20 seed files the round-3
    plan calls for; discovery failure -> loud, not silently green."""
    assert len(_FILES) >= 20, [str(p) for p in _FILES]
