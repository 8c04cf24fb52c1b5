"""Property-style differential fuzzing: random filter+aggregate queries
over lineitem, the same SQL text run through Spark SQL and DuckDB.

Rebuild of the reference's fuzz layer (reference:
spark/src/main/scala/org/apache/comet/testing/FuzzDataGenerator.scala:50-153,
test/scala/org/apache/comet/CometFuzzTestSuite.scala): instead of random
data against a fixed query, fixed data (the driver's deterministic
testdata) against randomly generated queries drawn from the dialect
subset both engines parse identically.  Derandomized so CI is stable;
every counterexample hypothesis finds is a genuine semantics divergence.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_comet_spark.testing import compare_to_oracle

NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
INT_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
KEY_COLS = ("l_returnflag", "l_linestatus", "l_linenumber")
CMP = ("<", "<=", ">", ">=", "=", "<>")

# literal ranges roughly matching the synthetic data so predicates are
# neither always-true nor always-false
LIT = {
    "l_quantity": st.integers(1, 50),
    "l_extendedprice": st.integers(1000, 90000),
    "l_discount": st.sampled_from([0.0, 0.02, 0.05, 0.08, 0.1]),
    "l_tax": st.sampled_from([0.0, 0.02, 0.05, 0.08]),
    "l_orderkey": st.integers(0, 60000),
    "l_partkey": st.integers(0, 20000),
    "l_suppkey": st.integers(0, 1000),
    "l_linenumber": st.integers(1, 7),
}


@st.composite
def predicate(draw) -> str:
    col = draw(st.sampled_from(NUM_COLS + INT_COLS))
    op = draw(st.sampled_from(CMP))
    lit = draw(LIT[col])
    return f"{col} {op} {lit}"


@st.composite
def query(draw) -> str:
    preds = draw(st.lists(predicate(), min_size=1, max_size=3))
    conj = draw(st.sampled_from([" AND ", " OR "]))
    where = conj.join(preds)
    key = draw(st.sampled_from(KEY_COLS))
    agg_col = draw(st.sampled_from(NUM_COLS))
    aggs = (
        f"count(*) AS n, "
        f"round(sum({agg_col}), 2) AS s, "
        f"min({agg_col}) AS mn, "
        f"max({agg_col}) AS mx"
    )
    return (
        f"SELECT {key} AS k, {aggs} FROM lineitem "
        f"WHERE {where} GROUP BY {key} ORDER BY k"
    )


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from datafusion_comet_spark.catalog import load_tables

    load_tables(spark, sf_dir, register_views=True)
    return spark


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=query())
def test_random_filter_agg_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def join_query(draw) -> str:
    """Random join shape: lineitem ⋈ orders with predicates on both
    sides, inner or left-outer, aggregated by an orders key."""
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    lpred = draw(predicate())
    o_lit = draw(st.integers(1000, 400000))
    key = draw(st.sampled_from(["o_orderpriority", "o_orderstatus"]))
    # null-safe aggregates: count(col) skips unmatched left-join rows,
    # exact-decimal sum avoids float ordering
    return (
        f"SELECT o.{key} AS k, count(l.l_orderkey) AS n, "
        f"round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS s "
        f"FROM orders o {how} "
        f"(SELECT * FROM lineitem WHERE {lpred}) l "
        f"ON o.o_orderkey = l.l_orderkey "
        f"WHERE o.o_totalprice > {o_lit} "
        f"GROUP BY o.{key} ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=join_query())
def test_random_join_agg_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def window_query(draw) -> str:
    """Random unordered-frame window over a filtered lineitem: per-row
    output with partition aggregates — deterministic because the frame
    is the whole partition and sums are exact decimals."""
    pred = draw(predicate())
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey % 10"]))
    val = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"round(sum(CAST({val} AS DECIMAL(18,2))) OVER (PARTITION BY {part}), 2) AS ws, "
        f"count(*) OVER (PARTITION BY {part}) AS wc "
        f"FROM lineitem WHERE {pred} "
        f"ORDER BY l_orderkey, l_linenumber"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=window_query())
def test_random_window_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def rollup_query(draw) -> str:
    """Random Expand-backed aggregate: ROLLUP/CUBE over two keys with
    grouping() disambiguation — the operator family (reference
    operator.proto:346-349) whose NULL-marker semantics are easiest to
    get subtly wrong across engines.

    Known (documented) divergence this generator works around: on
    EMPTY input the SQL standard (and DuckDB/Postgres) still emits one
    row for the () grouping set — count(*)=0 grand total — while Spark
    emits nothing (its Expand produces zero rows, so the aggregate has
    no groups).  HAVING count(*) > 0 removes that row from both
    engines, keeping the differential sound when a random predicate
    matches no rows."""
    op = draw(st.sampled_from(["ROLLUP", "CUBE"]))
    pred = draw(predicate())
    k1, k2 = "l_returnflag", "l_linestatus"
    val = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
    return (
        f"SELECT {k1} AS a, {k2} AS b, "
        f"CAST(grouping({k1}) * 2 + grouping({k2}) AS BIGINT) AS gid, "
        f"count(*) AS n, "
        f"round(sum(CAST({val} AS DECIMAL(18,2))), 2) AS s "
        f"FROM lineitem WHERE {pred} "
        f"GROUP BY {op} ({k1}, {k2}) "
        f"HAVING count(*) > 0 "
        f"ORDER BY gid, a NULLS FIRST, b NULLS FIRST"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=rollup_query())
def test_random_rollup_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def setop_query(draw) -> str:
    """Random set operation between two filtered projections of the
    same relation — INTERSECT/EXCEPT in DISTINCT and ALL multiset
    forms (Catalyst lowers these to joins/aggregates; DuckDB executes
    them directly — any multiplicity bug diverges immediately)."""
    op = draw(
        st.sampled_from(
            ["INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
        )
    )
    p1, p2 = draw(predicate()), draw(predicate())
    cols = draw(
        st.sampled_from(
            ["l_returnflag, l_linestatus", "l_suppkey % 50", "l_linenumber"]
        )
    )
    first = cols.split(",")[0].strip().split(" ")[0]
    alias_cols = cols if "," in cols else f"{cols} AS k"
    order = "1, 2" if "," in cols else "1"
    return (
        f"SELECT * FROM ("
        f"SELECT {alias_cols} FROM lineitem WHERE {p1} "
        f"{op} "
        f"SELECT {alias_cols} FROM lineitem WHERE {p2}"
        f") t ORDER BY {order}"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=setop_query())
def test_random_setop_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def sliding_frame_query(draw) -> str:
    """Random bounded ROWS frame over a UNIQUE total order — sliding
    sums/min/max with literal offsets, the frame family the reference
    supports natively only for literal ROWS bounds
    (CometWindowExec.scala:178-240).  The (l_orderkey, l_linenumber)
    ordering is a key, so frames are deterministic."""
    pred = draw(predicate())
    lo = draw(st.integers(0, 4))
    hi = draw(st.integers(0, 4))
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    val = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
    expr = (
        f"round({fn}(CAST({val} AS DECIMAL(18,2))) OVER w, 2)"
        if fn != "count"
        else "count(*) OVER w"
    )
    return (
        f"SELECT l_orderkey, l_linenumber, {expr} AS wv "
        f"FROM lineitem WHERE {pred} "
        f"WINDOW w AS (ORDER BY l_orderkey, l_linenumber "
        f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) "
        f"ORDER BY l_orderkey, l_linenumber"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=sliding_frame_query())
def test_random_sliding_frame_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def multi_distinct_query(draw) -> str:
    """Random multi-distinct aggregate: several count(DISTINCT <expr>)
    with DIFFERENT arguments (and band predicates) in one SELECT —
    exercises Catalyst's Expand-based multi-distinct rewrite (the
    tpcds_price_band_distincts plan shape) across random band
    boundaries, distinct targets, and filters.  Distinct targets stay
    integer-valued so cross-engine DISTINCT equality is exact."""
    band = draw(st.integers(5, 45))
    c1, c2 = draw(
        st.lists(
            st.sampled_from(INT_COLS), min_size=2, max_size=2, unique=True
        )
    )
    pred = draw(predicate())
    key = draw(st.sampled_from(KEY_COLS))
    return (
        f"SELECT {key} AS k, "
        f"CAST(count(DISTINCT CASE WHEN l_quantity <= {band} "
        f"THEN {c1} END) AS BIGINT) AS d_lo, "
        f"CAST(count(DISTINCT CASE WHEN l_quantity > {band} "
        f"THEN {c2} END) AS BIGINT) AS d_hi, "
        f"CAST(count(DISTINCT l_linenumber) AS BIGINT) AS d_ln, "
        f"count(*) AS n "
        f"FROM lineitem WHERE {pred} GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=multi_distinct_query())
def test_random_multi_distinct_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


@st.composite
def semi_anti_query(draw) -> str:
    """Random IN / NOT IN subquery filters — Catalyst lowers these to
    LeftSemi / null-aware LeftAnti joins (the reference's null-aware
    anti path, planner.rs:1818-1827); randomized over the subquery's
    dimension predicate, the membership polarity, and the outer
    aggregation key."""
    neg = draw(st.sampled_from(["IN", "NOT IN"]))
    size_lo = draw(st.integers(1, 25))
    size_hi = size_lo + draw(st.integers(5, 25))
    pred = draw(predicate())
    key = draw(st.sampled_from(KEY_COLS))
    return (
        f"SELECT {key} AS k, count(*) AS n, "
        f"CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty "
        f"FROM lineitem WHERE ({pred}) "
        f"AND l_partkey {neg} (SELECT p_partkey FROM part "
        f"WHERE p_size BETWEEN {size_lo} AND {size_hi}) "
        f"GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=semi_anti_query())
def test_random_semi_anti_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 9 (round 3): random CAST CHAINS — compositions of casts over
# in-range values, the same SQL on both engines.  The per-pair edge
# matrix (overflow, NaN, truncate-vs-round, rendering) lives in
# tests/test_cast_pairs.py with explicit pins; this family checks that
# COMPOSITIONS of the duck-compatible subset stay identical — the
# chained-cast shapes real queries produce (key % N AS SMALLINT,
# price AS DECIMAL AS DOUBLE, date round-trips through VARCHAR).
# Chains are constructed overflow-free so ANSI mode never raises.
# ---------------------------------------------------------------------------
_CAST_CHAINS = [
    ("l_linenumber", ["TINYINT", "SMALLINT", "INT", "BIGINT"]),
    ("l_suppkey % 120", ["SMALLINT", "INT", "STRING", "INT"]),
    ("l_quantity", ["INT", "DOUBLE", "DECIMAL(10,2)", "STRING"]),
    ("l_partkey", ["BIGINT", "STRING", "BIGINT"]),
    ("l_extendedprice", ["DECIMAL(12,2)", "DECIMAL(18,6)", "DOUBLE"]),
    ("l_shipdate", ["DATE", "STRING", "DATE", "TIMESTAMP"]),
]


@st.composite
def cast_chain_query(draw) -> str:
    src, chain = draw(st.sampled_from(_CAST_CHAINS))
    k = draw(st.integers(2, len(chain)))
    expr = src
    for t in chain[:k]:
        expr = f"CAST({expr} AS {t})"
    key_lit = draw(st.integers(5000, 50000))
    return (
        f"SELECT l_returnflag AS k, count(x) AS n, "
        f"CAST(min(x) AS STRING) AS mn, CAST(max(x) AS STRING) AS mx "
        f"FROM (SELECT l_returnflag, {expr} AS x FROM lineitem "
        f"WHERE l_orderkey < {key_lit}) t "
        f"GROUP BY l_returnflag ORDER BY k"
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=cast_chain_query())
def test_random_cast_chain_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 10 (round 3): random STRING-FUNCTION CHAINS — compositions of
# the duck-compatible string subset (upper/lower/trim/reverse/substr/
# replace/left/right/split_part/instr/length) applied to lineitem text
# columns.  The reference's string kernel is its second-largest compat
# surface after cast (native/spark-expr string functions;
# docs compatibility/expressions/*string*.md); compositions are where
# argument-order and NULL/empty-string conventions actually bite.
# regexp_* stays out (Spark replaces all occurrences, DuckDB only the
# first — pinned in tests/sql/string/regexp_extract_replace.sql).
# Runs over documents (the testdata's only free-text table).
# ---------------------------------------------------------------------------
_STR_COLS = ("text", "lang", "source")
_STR_UNARY = (
    "upper({0})",
    "lower({0})",
    "trim({0})",
    "reverse({0})",
    "substr({0}, 2, 6)",
    "replace({0}, 'a', '_')",
    "left({0}, 5)",
    "right({0}, 4)",
    "split_part({0}, ' ', 1)",
)
_STR_FINAL = (
    "length({0})",
    "instr({0}, 'e')",
    "{0}",
)


@st.composite
def string_chain_query(draw) -> str:
    col = draw(st.sampled_from(_STR_COLS))
    expr = col
    for _ in range(draw(st.integers(1, 3))):
        expr = draw(st.sampled_from(_STR_UNARY)).format(expr)
    expr = draw(st.sampled_from(_STR_FINAL)).format(expr)
    key_lit = draw(st.integers(500, 5000))
    return (
        f"SELECT lang AS k, count(x) AS n, "
        f"count(DISTINCT x) AS nd, "
        f"CAST(min(x) AS STRING) AS mn, CAST(max(x) AS STRING) AS mx "
        f"FROM (SELECT lang, {expr} AS x FROM documents "
        f"WHERE doc_id < {key_lit}) t "
        f"GROUP BY lang ORDER BY k"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=string_chain_query())
def test_random_string_chain_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 11 (round 3): random DATE-EXPRESSION CHAINS — truncation,
# interval shifts, last_day, and field extraction composed over
# l_shipdate.  Interval addition is CAST back to DATE because DuckDB
# widens date + INTERVAL to TIMESTAMP while Spark stays DATE — the
# composition is otherwise identical.
# ---------------------------------------------------------------------------
_DATE_STEPS = (
    "date_trunc('month', {0})",
    "date_trunc('quarter', {0})",
    "date_trunc('year', {0})",
    "last_day(CAST({0} AS DATE))",
    "CAST({0} AS DATE) + INTERVAL '7' DAY",
    "CAST({0} AS DATE) - INTERVAL '30' DAY",
)
_DATE_FINAL = (
    "year(CAST({0} AS DATE))",
    "month(CAST({0} AS DATE))",
    "dayofmonth(CAST({0} AS DATE))",
    "CAST(CAST({0} AS DATE) AS STRING)",
)


@st.composite
def date_chain_query(draw) -> str:
    expr = "l_shipdate"
    for _ in range(draw(st.integers(1, 3))):
        expr = draw(st.sampled_from(_DATE_STEPS)).format(expr)
    expr = draw(st.sampled_from(_DATE_FINAL)).format(expr)
    key_lit = draw(st.integers(5000, 50000))
    return (
        f"SELECT l_returnflag AS k, count(x) AS n, "
        f"count(DISTINCT x) AS nd, "
        f"CAST(min(x) AS STRING) AS mn, CAST(max(x) AS STRING) AS mx "
        f"FROM (SELECT l_returnflag, {expr} AS x FROM lineitem "
        f"WHERE l_orderkey < {key_lit}) t "
        f"GROUP BY l_returnflag ORDER BY k"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=date_chain_query())
def test_random_date_chain_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 12 (round 3): random ORDERED-SET AGGREGATES — percentile_cont
# / percentile_disc / mode / median drawn over random fractions,
# columns, predicates and group keys.  Safe to fuzz differentially
# because percentile interpolation is computed from the SORTED values
# (deterministic), unlike variance-family floats whose partial-agg
# addition order shifts low bits.
# ---------------------------------------------------------------------------
_OSA_FRACS = (0.1, 0.25, 0.5, 0.75, 0.9)


@st.composite
def ordered_set_query(draw) -> str:
    col = draw(st.sampled_from(NUM_COLS + INT_COLS))
    f1 = draw(st.sampled_from(_OSA_FRACS))
    f2 = draw(st.sampled_from(_OSA_FRACS))
    pred = draw(predicate())
    key = draw(st.sampled_from(KEY_COLS))
    return (
        f"SELECT {key} AS k, "
        f"round(CAST(percentile_cont({f1}) WITHIN GROUP (ORDER BY {col}) AS DOUBLE), 6) AS pc, "
        f"CAST(percentile_disc({f2}) WITHIN GROUP (ORDER BY {col}) AS DOUBLE) AS pd, "
        f"round(CAST(median({col}) AS DOUBLE), 6) AS med, "
        f"CAST(mode() WITHIN GROUP (ORDER BY {col}) AS DOUBLE) AS md "
        f"FROM lineitem WHERE {pred} "
        f"GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=ordered_set_query())
def test_random_ordered_set_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 13 (round 3): random CORRELATED SCALAR SUBQUERIES — per-row
# lookups in the SELECT list over random aggregates, correlation
# predicates and outer filters.  Stresses the decorrelation rewrite
# (subquery -> left outer aggregate join) both planners perform; a
# multiplicity or NULL-on-empty bug diverges immediately.  COUNT is
# the sharp edge: an empty correlated group must yield 0 (not NULL).
# ---------------------------------------------------------------------------
@st.composite
def correlated_scalar_query(draw) -> str:
    agg = draw(st.sampled_from(["count(*)", "min(l_quantity)", "max(l_linenumber)"]))
    o_pred = draw(st.sampled_from([
        "o_totalprice > 100000", "o_orderstatus = 'O'",
        "o_orderpriority = '1-URGENT'", "o_custkey % 7 = 0",
    ]))
    l_pred = draw(predicate())
    o_lit = draw(st.integers(1000, 30000))
    return (
        f"SELECT o_orderkey, "
        f"(SELECT {agg} FROM lineitem l "
        f" WHERE l.l_orderkey = o.o_orderkey AND {l_pred}) AS sub "
        f"FROM orders o "
        f"WHERE {o_pred} AND o_orderkey < {o_lit} "
        f"ORDER BY o_orderkey"
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=correlated_scalar_query())
def test_random_correlated_scalar_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 14 (round 7): TRIM-CHARSET + EDIT-DISTANCE chains — the two
# string surfaces the round-7 corpus sweep verified shared (standard
# TRIM(BOTH/LEADING/TRAILING chars FROM s) parses and agrees on both
# engines; levenshtein agrees on ASCII — it diverges on multibyte,
# Spark codepoints vs DuckDB bytes, pinned in
# tests/sql/string/levenshtein_unicode_bounds.sql, so arguments here
# are drawn ONLY from the ASCII-verified lang/source columns and
# ASCII literals).  2-arg btrim/ltrim stay out: operand order is
# engine-SWAPPED (COMPAT.md).
# ---------------------------------------------------------------------------
_TRIM_FORMS = (
    "trim(BOTH '{c}' FROM {e})",
    "trim(LEADING '{c}' FROM {e})",
    "trim(TRAILING '{c}' FROM {e})",
    "trim({e})",
)
_TRIM_CHARS = ("s", "rc", "01", "e ", "n")
_LEV_ARGS = ("lang", "source", "upper(lang)", "reverse(source)", "'src7'", "'en'")


@st.composite
def trim_lev_query(draw) -> str:
    base = draw(st.sampled_from(("source", "lang", "substr(text, 1, 12)")))
    expr = base
    for _ in range(draw(st.integers(1, 3))):
        form = draw(st.sampled_from(_TRIM_FORMS))
        expr = form.format(c=draw(st.sampled_from(_TRIM_CHARS)), e=expr)
    a = draw(st.sampled_from(_LEV_ARGS))
    b = draw(st.sampled_from(_LEV_ARGS))
    key_lit = draw(st.integers(100, 5000))
    return (
        f"SELECT lang AS k, count(x) AS n_trim, "
        f"CAST(min(x) AS STRING) AS mn, CAST(max(x) AS STRING) AS mx, "
        f"CAST(sum(length(x)) AS BIGINT) AS len_sum, "
        f"CAST(sum(levenshtein({a}, {b})) AS BIGINT) AS lev_sum, "
        f"CAST(max(levenshtein({a}, x)) AS BIGINT) AS lev_mx "
        f"FROM (SELECT lang, source, {expr} AS x FROM documents "
        f"WHERE doc_id < {key_lit}) t "
        f"GROUP BY lang ORDER BY k"
    )


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=trim_lev_query())
def test_random_trim_levenshtein_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 15 (round 8): random correlated EXISTS / NOT EXISTS — the
# q94/q95 shapes the round-7 driver rotation proved, generalized.
# Catalyst rewrites correlated EXISTS to LeftSemi and NOT EXISTS to a
# (non-null-aware) LeftAnti (RewritePredicateSubquery) — a DIFFERENT
# planner path than the IN/NOT IN family above (null-aware anti): the
# correlation is an equi-condition plus a random extra inner
# predicate, so the rewrite must fuse both into the join condition.
# Randomized over polarity, the correlated table predicate, an outer
# predicate, and the aggregation key.
# ---------------------------------------------------------------------------
@st.composite
def exists_query(draw) -> str:
    neg = draw(st.sampled_from(["EXISTS", "NOT EXISTS"]))
    inner_pred = draw(predicate())
    prio = draw(st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]))
    key = draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    return (
        f"SELECT {key} AS k, count(*) AS n, "
        f"CAST(sum(o_custkey) AS BIGINT) AS sc "
        f"FROM orders WHERE o_orderpriority <> '{prio}' "
        f"AND {neg} (SELECT 1 FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND ({inner_pred})) "
        f"GROUP BY {key} ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=exists_query())
def test_random_correlated_exists_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 16 (round 8): random explicit GROUPING SETS — a different
# Expand configuration than the ROLLUP/CUBE family above: the set
# list is an arbitrary subset of the powerset of three keys (possibly
# omitting the grand total, possibly duplicating a column across
# sets), so the Expand projection list and the grouping-id assignment
# are exercised beyond the two fixed hierarchies.  Same empty-input
# workaround as rollup_query (HAVING count(*) > 0).
# ---------------------------------------------------------------------------
@st.composite
def grouping_sets_query(draw) -> str:
    keys = ["l_returnflag", "l_linestatus", "l_linenumber"]
    all_sets = [
        "(l_returnflag)",
        "(l_linestatus)",
        "(l_linenumber)",
        "(l_returnflag, l_linestatus)",
        "(l_returnflag, l_linenumber)",
        "(l_linestatus, l_linenumber)",
        "(l_returnflag, l_linestatus, l_linenumber)",
        "()",
    ]
    # the full 3-key set is always present so every key is a grouping
    # column in at least one set — DuckDB's binder (and the standard)
    # rejects grouping(col) when col appears in NO set, which a fully
    # random subset can produce
    full = "(l_returnflag, l_linestatus, l_linenumber)"
    sets = draw(
        st.lists(st.sampled_from(all_sets), min_size=0, max_size=3, unique=True)
    )
    if full not in sets:
        sets.append(full)
    pred = draw(predicate())
    val = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
    gid = " + ".join(
        f"grouping({k}) * {2 ** i}" for i, k in enumerate(keys)
    )
    return (
        f"SELECT {keys[0]} AS a, {keys[1]} AS b, {keys[2]} AS c, "
        f"CAST({gid} AS BIGINT) AS gid, count(*) AS n, "
        f"round(sum(CAST({val} AS DECIMAL(18,2))), 2) AS s "
        f"FROM lineitem WHERE {pred} "
        f"GROUP BY GROUPING SETS ({', '.join(sets)}) "
        f"HAVING count(*) > 0 "
        f"ORDER BY gid, a NULLS FIRST, b NULLS FIRST, c NULLS FIRST"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=grouping_sets_query())
def test_random_grouping_sets_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 17 (round 8): random FULL OUTER join + aggregate — the join
# family above stops at LEFT; FULL OUTER exercises null emission on
# BOTH sides (Spark: SortMergeJoin FullOuter — no broadcast fallback
# exists for it, so this is also the one join type that always
# shuffles both inputs).  Keys are disjoint filtered projections so
# both null sides are populated; aggregates are null-safe counts and
# exact-decimal sums over COALESCE'd keys.
# ---------------------------------------------------------------------------
@st.composite
def full_outer_query(draw) -> str:
    p1 = draw(predicate())
    p2 = draw(predicate())
    bucket = draw(st.integers(3, 9))
    return (
        f"SELECT COALESCE(a.k, b.k) AS k, "
        f"count(a.k) AS n_left, count(b.k) AS n_right, "
        f"round(sum(CAST(a.s AS DECIMAL(18,2))), 2) AS s_left, "
        f"round(sum(CAST(b.s AS DECIMAL(18,2))), 2) AS s_right "
        f"FROM "
        f"(SELECT l_suppkey % {bucket} AS k, sum(CAST(l_quantity AS DECIMAL(18,2))) AS s "
        f" FROM lineitem WHERE {p1} GROUP BY 1) a "
        f"FULL JOIN "
        f"(SELECT l_suppkey % {bucket} AS k, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s "
        f" FROM lineitem WHERE {p2} GROUP BY 1) b "
        f"ON a.k = b.k "
        f"GROUP BY COALESCE(a.k, b.k) ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=full_outer_query())
def test_random_full_outer_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 18 (round 8): random RANKING functions under heavy ties —
# the window family above pins unordered-frame aggregates; this one
# pins the rank ladder (rank gaps, dense_rank compaction,
# percent_rank's (r-1)/(n-1), cume_dist's peer-inclusive fraction)
# over LOW-CARDINALITY order keys, where tie handling is the whole
# semantics.  All four functions are pure functions of the order-key
# VALUE (every peer gets the same output), so the differential is
# deterministic under ties — unlike row_number/ntile, which split
# peers by physical position and are deliberately excluded.
# ---------------------------------------------------------------------------
@st.composite
def ranking_query(draw) -> str:
    pred = draw(predicate())
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus"]))
    okey = draw(
        st.sampled_from(
            ["l_linenumber", "l_suppkey % 5", "CAST(l_quantity AS INT) % 7"]
        )
    )
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    w = f"PARTITION BY {part} ORDER BY {okey} {direction}"
    return (
        f"SELECT l_orderkey, l_linenumber, "
        f"rank() OVER ({w}) AS rnk, "
        f"dense_rank() OVER ({w}) AS drnk, "
        f"round(percent_rank() OVER ({w}), 6) AS prnk, "
        f"round(cume_dist() OVER ({w}), 6) AS cd "
        f"FROM lineitem WHERE {pred} "
        f"ORDER BY l_orderkey, l_linenumber"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=ranking_query())
def test_random_ranking_ties_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 19 (round 8): random correlated LATERAL aggregates — the
# decorrelation path for aggregate subqueries in FROM (Catalyst's
# DecorrelateInnerQuery / RewriteCorrelatedScalarSubquery).  The outer
# is DISTINCT keys OF THE SAME filtered relation, so every outer row
# has children — deliberately sidestepping the known childless-row
# divergence (DuckDB's comma-LATERAL drops childless outers; pinned
# separately in tests/sql/subquery/lateral_empty_aggregate.sql).
# Randomized over the shared predicate, the lateral aggregate, and an
# extra inequality correlation term.
# ---------------------------------------------------------------------------
@st.composite
def lateral_agg_query(draw) -> str:
    pred = draw(predicate())
    agg = draw(
        st.sampled_from(
            [
                "count(*) AS a",
                "CAST(max(l.l_linenumber) AS BIGINT) AS a",
                "CAST(min(l.l_suppkey) AS BIGINT) AS a",
                "CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS a",
            ]
        )
    )
    extra = draw(st.sampled_from(["", "AND l.l_linenumber >= o.mn "]))
    return (
        f"SELECT o.l_orderkey AS k, t.a "
        f"FROM (SELECT l_orderkey, min(l_linenumber) AS mn FROM lineitem "
        f"      WHERE {pred} GROUP BY l_orderkey) o, "
        f"LATERAL (SELECT {agg} FROM lineitem l "
        f"         WHERE l.l_orderkey = o.l_orderkey {extra}) t "
        f"ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=lateral_agg_query())
def test_random_lateral_agg_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 20 (round 8): random HAVING predicates — a Filter ABOVE the
# aggregate, evaluated against aggregate results rather than input
# rows (a different operator position than every WHERE family above;
# Catalyst must keep the predicate from being pushed through the
# aggregation).  Predicates stay on count(*) and integer-exact sums
# so a boundary row can't flake on float partial-sum ordering.
# ---------------------------------------------------------------------------
@st.composite
def having_query(draw) -> str:
    pred = draw(predicate())
    key = draw(st.sampled_from(KEY_COLS))
    n_lo = draw(st.integers(1, 400))
    q_lo = draw(st.integers(50, 20000))
    conj = draw(st.sampled_from(["AND", "OR"]))
    return (
        f"SELECT {key} AS k, count(*) AS n, "
        f"CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty "
        f"FROM lineitem WHERE {pred} GROUP BY {key} "
        f"HAVING count(*) >= {n_lo} {conj} "
        f"sum(CAST(l_quantity AS BIGINT)) > {q_lo} "
        f"ORDER BY k"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=having_query())
def test_random_having_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 21 (round 8): random numeric RANGE frames over DUPLICATE
# order values — the value-based frame complement of the ROWS family
# above: frame membership is decided by order-key DISTANCE, so every
# peer (duplicate value) is in or out together and the result is a
# pure function of the key — deterministic under ties where a ROWS
# frame would not be.  Randomized over the offset pair, direction of
# the low-cardinality key, and the aggregate.
# ---------------------------------------------------------------------------
@st.composite
def range_frame_query(draw) -> str:
    pred = draw(predicate())
    part = draw(st.sampled_from(["l_returnflag", "l_linestatus"]))
    okey = draw(st.sampled_from(["l_linenumber", "l_suppkey % 10"]))
    lo = draw(st.integers(0, 3))
    hi = draw(st.integers(0, 3))
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    expr = (
        f"round({fn}(CAST(l_quantity AS DECIMAL(18,2))) OVER w, 2)"
        if fn != "count"
        else "count(*) OVER w"
    )
    return (
        f"SELECT l_orderkey, l_linenumber, {expr} AS wv "
        f"FROM lineitem WHERE {pred} "
        f"WINDOW w AS (PARTITION BY {part} ORDER BY {okey} "
        f"RANGE BETWEEN {lo} PRECEDING AND {hi} FOLLOWING) "
        f"ORDER BY l_orderkey, l_linenumber"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=range_frame_query())
def test_random_range_frame_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 22 (round 8): random TWO-LEVEL aggregation — aggregate of an
# aggregate through a derived table (the mergeable-rollup shape the
# materialized-cascade operators rely on: inner partial per fine key,
# outer merge per coarse key).  Catalyst plans two HashAggregate
# pairs and TWO hash exchanges — hashpartitioning(k1, k2) does NOT
# co-locate k1 (same k1, different k2 hashes elsewhere), so the outer
# aggregate legitimately reshuffles; the scale lever is that it
# reshuffles the TINY inner result, not the fact table (measured: 2
# hash + 1 range exchange on this shape).  Integer-exact inner sums
# so the outer min/max/sum are boundary-safe.
# ---------------------------------------------------------------------------
@st.composite
def reagg_query(draw) -> str:
    pred = draw(predicate())
    k1 = draw(st.sampled_from(["l_returnflag", "l_linestatus"]))
    k2 = draw(st.sampled_from(["l_linenumber", "l_suppkey % 10"]))
    outer = draw(
        st.sampled_from(
            [
                "CAST(max(inner_qty) AS BIGINT) AS o",
                "CAST(min(inner_qty) AS BIGINT) AS o",
                "CAST(sum(inner_qty) AS BIGINT) AS o",
                "count(*) AS o",
            ]
        )
    )
    return (
        f"SELECT k1, {outer} FROM ("
        f"SELECT {k1} AS k1, {k2} AS k2, "
        f"sum(CAST(l_quantity AS BIGINT)) AS inner_qty "
        f"FROM lineitem WHERE {pred} GROUP BY {k1}, {k2}"
        f") t GROUP BY k1 ORDER BY k1"
    )


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=reagg_query())
def test_random_reaggregation_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 23 (round 9): random HIGHER-ORDER ARRAY-FUNCTION chains —
# transform/filter/slice compositions over split(text) with a scalar
# reducer on top.  The array+lambda surface is corpus-pinned
# (tests/sql/array/) but was never fuzzed; compositions are where
# lambda scoping, empty-array, and slice-bound conventions bite.
# Spark and DuckDB spell every step differently (transform vs
# list_transform, slice(start, LENGTH) vs list_slice(start, END-
# inclusive), aggregate-with-seed vs list_sum-over-transform — whose
# empty-list result is NULL in DuckDB but the seed 0 in Spark, hence
# the coalesce), so the strategy draws ONE chain and emits BOTH
# dialects; a value bug in either lambda engine breaks the match.
# Reference analog: the array kernel compat docs
# (docs/source/user-guide/compatibility.md array section).
# ---------------------------------------------------------------------------
_HOF_STEPS = (
    # (spark template, duckdb template) over {0} = array<string> expr
    ("transform({0}, x -> upper(x))", "list_transform({0}, x -> upper(x))"),
    ("transform({0}, x -> substr(x, 1, 3))",
     "list_transform({0}, x -> substr(x, 1, 3))"),
    ("transform({0}, x -> concat(x, '.'))",
     "list_transform({0}, x -> concat(x, '.'))"),
    ("filter({0}, x -> length(x) > 2)",
     "list_filter({0}, x -> length(x) > 2)"),
    ("filter({0}, x -> x LIKE '%e%')",
     "list_filter({0}, x -> x LIKE '%e%')"),
)
_HOF_FINAL = (
    ("CAST(size({0}) AS BIGINT)", "CAST(len({0}) AS BIGINT)"),
    ("array_max({0})", "list_max({0})"),
    ("array_min({0})", "list_min({0})"),
    # empty-list divergence: Spark array_join([]) = '' but DuckDB
    # array_to_string([]) = NULL (string_agg-of-zero-rows convention);
    # inputs are never NULL here so coalesce bridges exactly
    ("array_join(sort_array({0}), '|')",
     "coalesce(array_to_string(list_sort({0}), '|'), '')"),
    ("CAST(aggregate({0}, 0L, (acc, x) -> acc + length(x)) AS BIGINT)",
     "CAST(coalesce(list_sum(list_transform({0}, x -> length(x))), 0)"
     " AS BIGINT)"),
)


@st.composite
def hof_chain_pair(draw) -> tuple[str, str]:
    s_expr = "split(text, ' ')"
    d_expr = "string_split(text, ' ')"
    for _ in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            start = draw(st.integers(1, 3))
            length = draw(st.integers(1, 4))
            s_expr = f"slice({s_expr}, {start}, {length})"
            d_expr = f"list_slice({d_expr}, {start}, {start + length - 1})"
        else:
            s_t, d_t = draw(st.sampled_from(_HOF_STEPS))
            s_expr, d_expr = s_t.format(s_expr), d_t.format(d_expr)
    s_fin, d_fin = draw(st.sampled_from(_HOF_FINAL))
    s_expr, d_expr = s_fin.format(s_expr), d_fin.format(d_expr)
    lit = draw(st.integers(200, 2000))
    shell = (
        "SELECT lang AS k, count(v) AS n, count(DISTINCT v) AS nd, "
        "CAST(min(v) AS STRING) AS mn, CAST(max(v) AS STRING) AS mx "
        "FROM (SELECT lang, {expr} AS v FROM documents "
        "WHERE doc_id < {lit}) t GROUP BY lang ORDER BY k"
    )
    return (
        shell.format(expr=s_expr, lit=lit),
        shell.format(expr=d_expr, lit=lit),
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=hof_chain_pair())
def test_random_hof_array_chain_matches_duckdb(views, sf_dir, pair):
    spark_sql, duck_sql = pair
    df = views.sql(spark_sql)
    compare_to_oracle(df, duck_sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 24 (round 9): random MULTI-KEY ORDER BY with explicit NULLS
# FIRST/LAST + LIMIT/OFFSET — the Sort(+fetch/skip) operator under
# adversarial null placement (SURVEY §2 row 9/10).  The engines'
# DEFAULTS disagree (Spark: NULLS FIRST for ASC; DuckDB: NULLS LAST),
# so every key spells its null order explicitly — the fuzz then
# proves the explicit spellings agree, and a unique trailing
# tiebreak (o_orderkey ASC) makes the LIMIT/OFFSET window a
# deterministic row SET the multiset compare can check exactly.
# NULLs are synthesized with nullif() over derived keys since the
# testdata columns are all non-null.
# ---------------------------------------------------------------------------
_NULLABLE_KEYS = (
    "nullif(o_custkey % {p}, {q})",
    "nullif(length(o_orderpriority) % {p}, {q})",
    # floor() before the cast: double->BIGINT CAST truncates in Spark
    # but rounds half-even in DuckDB (pinned in tests/test_cast_pairs)
    "nullif(CAST(floor(o_totalprice / 1000) AS BIGINT) % {p}, {q})",
)


@st.composite
def null_order_limit_query(draw) -> str:
    keys = []
    for _ in range(draw(st.integers(1, 2))):
        tpl = draw(st.sampled_from(_NULLABLE_KEYS))
        p = draw(st.integers(3, 9))
        expr = tpl.format(p=p, q=draw(st.integers(0, p - 1)))
        direction = draw(st.sampled_from(["ASC", "DESC"]))
        nulls = draw(st.sampled_from(["NULLS FIRST", "NULLS LAST"]))
        keys.append((expr, direction, nulls))
    sel = ", ".join(f"{e} AS s{i}" for i, (e, _, _) in enumerate(keys))
    order = ", ".join(
        f"s{i} {d} {n}" for i, (_, d, n) in enumerate(keys)
    )
    limit = draw(st.integers(1, 40))
    offset = draw(st.integers(0, 30))
    return (
        f"SELECT o_orderkey AS k, {sel} FROM orders "
        f"ORDER BY {order}, k ASC LIMIT {limit} OFFSET {offset}"
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=null_order_limit_query())
def test_random_null_order_limit_matches_duckdb(views, sf_dir, sql):
    df = views.sql(sql)
    compare_to_oracle(df, sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 25 (round 9): random MAP construction + lookup — literal-keyed
# maps over numeric lineitem expressions, probed with present, absent,
# and drawn keys.  Map kernels are corpus-pinned (tests/sql/map/) but
# were never fuzzed; the dialects differ in BOTH construction (Spark
# interleaved map(k,v,k,v) vs DuckDB map([keys],[values])) and lookup
# result shape (Spark element_at returns the VALUE or NULL; DuckDB's
# returns a LIST — [] when absent — so the oracle appends [1]).  Keys
# are literals, never data-derived: Spark raises DUPLICATE_MAP_KEY
# where DuckDB keeps the last, a divergence pinned in the corpus, and
# a fuzz family must generate only from the shared-semantics subset.
# ---------------------------------------------------------------------------
_MAP_VALS = (
    "CAST(l_quantity AS BIGINT)",
    "l_linenumber * 10",
    "l_orderkey % 53",
    "l_suppkey % 97",
)


@st.composite
def map_lookup_pair(draw) -> tuple[str, str]:
    n = draw(st.integers(2, 4))
    keys = ["a", "b", "c", "d"][:n]
    vals = [draw(st.sampled_from(_MAP_VALS)) for _ in range(n)]
    s_map = "map(" + ", ".join(f"'{k}', {v}" for k, v in zip(keys, vals)) + ")"
    d_map = (
        "map(["
        + ", ".join(f"'{k}'" for k in keys)
        + "], ["
        + ", ".join(vals)
        + "])"
    )
    probe = draw(st.sampled_from(keys + ["z"]))  # 'z' is always absent
    final = draw(st.sampled_from(["lookup", "size", "keys"]))
    if final == "lookup":
        s_expr = f"element_at({s_map}, '{probe}')"
        d_expr = f"element_at({d_map}, '{probe}')[1]"
    elif final == "size":
        s_expr = f"CAST(size({s_map}) AS BIGINT)"
        d_expr = f"CAST(cardinality({d_map}) AS BIGINT)"
    else:
        s_expr = f"array_join(map_keys({s_map}), '|')"
        d_expr = f"array_to_string(map_keys({d_map}), '|')"
    pred = draw(st.sampled_from([
        "l_orderkey < 2000",
        "l_partkey % 5 = 0",
        "l_linenumber <= 3",
    ]))
    shell = (
        "SELECT l_returnflag AS k, count(v) AS n, "
        "CAST(min(v) AS STRING) AS mn, CAST(max(v) AS STRING) AS mx "
        "FROM (SELECT l_returnflag, {expr} AS v FROM lineitem "
        "WHERE {pred}) t GROUP BY l_returnflag ORDER BY k"
    )
    return (
        shell.format(expr=s_expr, pred=pred),
        shell.format(expr=d_expr, pred=pred),
    )


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=map_lookup_pair())
def test_random_map_lookup_matches_duckdb(views, sf_dir, pair):
    spark_sql, duck_sql = pair
    df = views.sql(spark_sql)
    compare_to_oracle(df, duck_sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 26 (round 9): random PIVOT — the relational pivot clause
# (SURVEY §2 Expand-adjacent; `pivot_linestatus` is its one static
# registry query) fuzzed across pivot column, value-subset, aggregate,
# and grouping expression.  Catalyst rewrites PIVOT to one aggregate
# over agg(if(p = value, v, null)) per cell, so the family exercises
# the conditional-aggregation rewrite rather than a dedicated
# operator.  Dual-dialect because DuckDB's PIVOT is a different
# statement form: the oracle spells the SAME cells as FILTERed
# aggregates.  Shared-semantics notes: a group whose rows all carry
# non-listed pivot values still emits a row (all-NULL cells) in both
# engines; empty-cell count() is 0 (not NULL) in both (Spark:
# count over the if()-nulls; DuckDB: count FILTER of zero rows);
# sum/min/max empty cells are NULL in both.  Every aggregate and the
# grouping key are CAST to BIGINT so engine result-type conventions
# (DuckDB sum(BIGINT) -> HUGEINT) cannot leak into the compare.
# ---------------------------------------------------------------------------
_PIVOT_SOURCES = (
    # (table, pivot col, full value domain, group exprs, value exprs)
    (
        "lineitem",
        "l_returnflag",
        ("A", "N", "R"),
        ("l_linenumber", "l_suppkey % 7", "CAST(l_quantity AS BIGINT) % 5"),
        ("CAST(l_quantity AS BIGINT)", "l_orderkey % 997", "l_partkey % 53"),
    ),
    (
        "lineitem",
        "l_linestatus",
        ("F", "O"),
        ("l_linenumber", "l_partkey % 9"),
        ("CAST(l_quantity AS BIGINT)", "l_suppkey % 101"),
    ),
    (
        "orders",
        "o_orderstatus",
        ("F", "O", "P"),
        ("o_custkey % 7", "length(o_orderpriority)"),
        ("o_orderkey % 997", "CAST(floor(o_totalprice / 100) AS BIGINT)"),
    ),
    # NULLABLE pivot column (round-9 advice): ~1/11 of rows carry a
    # NULL pivot value.  Two semantic corners this source exercises:
    # (a) groups whose rows ALL have non-matching (incl. NULL) pivot
    # values still emit a row with empty cells in both engines, and
    # (b) NULL may itself be drawn as a pivot value — Spark matches it
    # null-safely (PIVOT ... IN (NULL)), while the DuckDB oracle must
    # spell that cell `FILTER (WHERE p IS NULL)` because `p = NULL`
    # drops every row under three-valued logic (probed live, round 10).
    (
        "lineitem",
        "CASE WHEN l_partkey % 11 = 0 THEN NULL ELSE l_linestatus END",
        ("F", "O", None),
        ("l_linenumber", "l_suppkey % 5"),
        ("CAST(l_quantity AS BIGINT)", "l_orderkey % 499"),
    ),
)
_PIVOT_PREDS = {
    "lineitem": ("l_orderkey < 4000", "l_linenumber <= 4", "l_partkey % 3 = 0"),
    "orders": ("o_orderkey < 6000", "o_custkey % 2 = 0",
               "o_orderpriority LIKE '%URGENT'"),
}


@st.composite
def pivot_pair(draw) -> tuple[str, str]:
    table, pcol, domain, gexprs, vexprs = draw(st.sampled_from(_PIVOT_SOURCES))
    g = draw(st.sampled_from(gexprs))
    v = draw(st.sampled_from(vexprs))
    agg = draw(st.sampled_from(["sum", "min", "max", "count"]))
    pred = draw(st.sampled_from(_PIVOT_PREDS[table]))
    # non-empty value subset, domain order preserved (cell columns are
    # aliased positionally, so order only affects the schema, which the
    # oracle mirrors exactly)
    picks = [
        val for val in domain
        if draw(st.booleans())
    ] or [domain[0]]
    s_cells = ", ".join(
        ("NULL" if val is None else f"'{val}'") + f" AS c{i}"
        for i, val in enumerate(picks)
    )
    d_cells = ", ".join(
        "CAST({agg}(v) FILTER (WHERE {cond}) AS BIGINT) AS c{i}".format(
            agg=agg,
            cond="p IS NULL" if val is None else f"p = '{val}'",
            i=i,
        )
        for i, val in enumerate(picks)
    )
    base = (
        f"SELECT CAST({g} AS BIGINT) AS g, {pcol} AS p, {v} AS v "
        f"FROM {table} WHERE {pred}"
    )
    spark_sql = (
        f"SELECT * FROM ({base}) "
        f"PIVOT (CAST({agg}(v) AS BIGINT) FOR p IN ({s_cells})) ORDER BY g"
    )
    duck_sql = (
        f"SELECT g, {d_cells} FROM ({base}) t GROUP BY g ORDER BY g"
    )
    return spark_sql, duck_sql


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=pivot_pair())
def test_random_pivot_matches_duckdb(views, sf_dir, pair):
    spark_sql, duck_sql = pair
    df = views.sql(spark_sql)
    compare_to_oracle(df, duck_sql, sf_dir)


# ---------------------------------------------------------------------------
# Family 27 (round 10): random WINNOWING parameters — the local
# fingerprinting scheme behind dedup_winnow_fingerprint, fuzzed across
# gram width k, window width w, gram joiner, and an optional token
# filter.  The registry query pins ONE (k=4, w=4) configuration; the
# scheme's cross-engine risk is the 1-based slice/sequence arithmetic
# (Spark slice(arr, i, len) vs DuckDB arr[i:j] inclusive, sequence vs
# exclusive-end range) where an off-by-one silently shifts every
# fingerprint, so the family sweeps the parameter grid and compares
# per-document fingerprint-set summaries (count/min/max — order-free;
# DuckDB's list_distinct output order is unspecified).  Token filters
# apply BEFORE gram building on both sides, so positions stay aligned
# by construction.
# ---------------------------------------------------------------------------
@st.composite
def winnow_pair(draw) -> tuple[str, str]:
    k = draw(st.integers(2, 5))
    w = draw(st.integers(2, 5))
    joiner = draw(st.sampled_from([" ", "|", ""]))
    cap = draw(st.sampled_from([150, 300]))
    tokfilter = draw(st.sampled_from([None, "length({t}) > 2", "{t} <> 'the'"]))
    s_toks = "split(lower(text), ' ')"
    d_toks = "str_split(lower(text), ' ')"
    if tokfilter:
        s_toks = f"filter({s_toks}, t -> {tokfilter.format(t='t')})"
        d_toks = f"list_filter({d_toks}, t -> {tokfilter.format(t='t')})"
    spark_sql = f"""
SELECT doc_id,
       CAST(size(fps) AS BIGINT) AS n_fps,
       array_min(fps) AS mn, array_max(fps) AS mx
FROM (
  SELECT doc_id,
         array_distinct(transform(sequence(1, size(hashes) - {w} + 1),
           s -> array_min(slice(hashes, s, {w})))) AS fps
  FROM (
    SELECT doc_id,
           transform(sequence(1, size(toks) - {k} + 1),
             i -> substring(md5(concat_ws('{joiner}', slice(toks, i, {k}))), 1, 16)) AS hashes
    FROM (SELECT doc_id, {s_toks} AS toks FROM documents WHERE doc_id < {cap})
    WHERE size(toks) >= {k} + {w} - 1
  )
)
ORDER BY doc_id
"""
    duck_sql = f"""
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fps,
       list_aggregate(fps, 'min') AS mn, list_aggregate(fps, 'max') AS mx
FROM (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(hashes) - {w} + 2),
           s -> list_aggregate(hashes[s:s+{w - 1}], 'min'))) AS fps
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(toks) - {k} + 2),
             i -> substr(md5(array_to_string(toks[i:i+{k - 1}], '{joiner}')), 1, 16)) AS hashes
    FROM (SELECT doc_id, {d_toks} AS toks FROM documents WHERE doc_id < {cap})
    WHERE len(toks) >= {k} + {w} - 1
  )
)
ORDER BY doc_id
"""
    return spark_sql, duck_sql


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=winnow_pair())
def test_random_winnow_matches_duckdb(views, sf_dir, pair):
    spark_sql, duck_sql = pair
    df = views.sql(spark_sql)
    compare_to_oracle(df, duck_sql, sf_dir)
