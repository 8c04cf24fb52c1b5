"""Size-gated broadcast hints on scaling tables (_shared._dim_hint).

A broadcast HINT is honored by Catalyst unconditionally, so a hard
``F.broadcast(part)`` is free performance at sf0.1 (part = 1 MB) and a
driver OOM at sf1000 (part = 30 GB) — the exact "hint pinning broadcast
on a growing table" bug the plan-regime ladder in SCALE.md names as the
classic OOM-at-scale failure.  Round 10 moved every hint on a table
that grows with the scale factor (part / supplier / customer /
documents-derived) behind ``_dim_hint``, which applies the hint only
while the base table's on-disk footprint fits the broadcast budget.

These tests pin the mechanism in BOTH directions with the session's
auto-broadcast threshold disabled, so the hint is the only possible
source of a broadcast join:

- small regime: the hint is applied -> BroadcastHashJoin even with
  autoBroadcastJoinThreshold = -1;
- forged large regime (table_bytes cache poked to 1 GB): the hint is
  withheld -> the same query plans a shuffle join.
"""

from __future__ import annotations

from contextlib import contextmanager

from datafusion_comet_spark.catalog import _TABLE_BYTES_CACHE, table_bytes
from datafusion_comet_spark.queries import load_all


@contextmanager
def _no_auto_broadcast(spark):
    saved = {}
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        saved[k] = spark.conf.get(k)
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@contextmanager
def _forged_bytes(sf_dir: str, name: str, nbytes: int):
    key = (sf_dir, name)
    saved = _TABLE_BYTES_CACHE.get(key)
    _TABLE_BYTES_CACHE[key] = nbytes
    try:
        yield
    finally:
        if saved is None:
            _TABLE_BYTES_CACHE.pop(key, None)
        else:
            _TABLE_BYTES_CACHE[key] = saved


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_hint_flips_with_table_size(spark, sf_dir):
    """q14 (lineitem ⋈ part on l_partkey): hinted-broadcast while part
    is small, shuffle join once part's size is past the budget."""
    reg = load_all()
    q14 = reg["q14_promo_revenue"].fn

    with _no_auto_broadcast(spark):
        # small regime: only the hint can broadcast, and it does
        plan_small = _final_plan(q14(spark, sf_dir))
        assert "BroadcastHashJoin" in plan_small, plan_small[:1500]

        # forged 1 GB part: the hint is withheld; with auto-broadcast
        # off the join must fall back to a shuffle strategy
        with _forged_bytes(sf_dir, "part", 1 << 30):
            plan_large = _final_plan(q14(spark, sf_dir))
            assert "BroadcastHashJoin" not in plan_large, plan_large[:1500]
            assert (
                "SortMergeJoin" in plan_large
                or "ShuffledHashJoin" in plan_large
            ), plan_large[:1500]


def test_dim_hint_results_identical_across_regimes(spark, sf_dir):
    """The gate changes join STRATEGY only — q14/q17 values must be
    identical with the hint applied and withheld."""
    reg = load_all()
    for name in ("q14_promo_revenue", "q17_small_quantity"):
        fn = reg[name].fn
        base = fn(spark, sf_dir).collect()
        with _no_auto_broadcast(spark), _forged_bytes(sf_dir, "part", 1 << 30):
            large = fn(spark, sf_dir).collect()
        assert base == large, (name, base[:3], large[:3])


def test_fixed_dims_always_hinted(spark, sf_dir):
    """region/nation are fixed-cardinality at every SF: the hint stays
    even under a forged-large byte count (the gate consults
    FIXED_SIZE_DIMS first)."""
    reg = load_all()
    q5 = reg["q5_local_supplier"].fn
    with _no_auto_broadcast(spark), \
         _forged_bytes(sf_dir, "nation", 1 << 30), \
         _forged_bytes(sf_dir, "region", 1 << 30):
        plan = _final_plan(q5(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_table_bytes_is_positive_and_cached(sf_dir):
    a = table_bytes(sf_dir, "lineitem")
    assert a > 0
    assert table_bytes(sf_dir, "lineitem") == a
