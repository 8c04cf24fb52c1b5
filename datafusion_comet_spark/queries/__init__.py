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
# Round-10 rotation (per the round-9 verdict's "Next round #3", the
# exact depth-1 plan dev/sample_debt.py prints).  The registry is
# complete (every query has a driver row as of r9), so rotation is now
# pure freshness-cranking: slots 1-7 are the tpcds_style3 cohort whose
# last driver rows are the registry's oldest (r2/r3), slots 8-50 the
# datapipe/text/similarity family (r3 vintage, 7 rounds stale).  This
# batch carries extra weight: `dedup_levenshtein` (slot 22) and
# `dedup_embedding_cosine` (slot 17) get their first DRIVER re-proof
# since the round-9 sorted-neighborhood / axis-sign-LSH rewrites
# (locally green at 4 scales, but a driver hash row is the stronger
# evidence), and `ann_bruteforce_topk` re-proves the ANN baseline
# after the round-9 Lloyd quantizer rewrite.  After this rotation the
# oldest driver row in the registry advances from r2 to r4.  All 328
# oracles still run locally every round regardless
# (tests/test_queries_oracle.py).
SAMPLE_PREFIX: tuple[str, ...] = (
    # 1-7: tpcds_style3 cohort — the registry's oldest rows (r2/r3)
    "tpcds_customer_cohort_setops",
    "tpcds_rank_in_category",
    "tpcds_cumulative_compare",
    "tpcds_rollup_rank_hierarchy",
    "tpcds_time_band_counts",
    "tpcds_yoy_channel_ratio",
    "tpcds_purchase_overlap",
    # 8-10: similarity family.  ann_bruteforce_topk is the r3-vintage
    # post-Lloyd-rewrite re-proof; the two star-cluster dedups are the
    # round-10 duplication-skew additions and have never had a driver
    # row — never-sampled outranks stale-green, so they take the slots
    # the (single-agg, low-divergence-risk) embedding_norm_stats /
    # embedding_quantize_int8 re-proofs would have used.
    "ann_bruteforce_topk",
    "dedup_lsh_star_cluster",
    "dedup_embedding_star_cluster",
    # 11-50: datapipe/text family (r3 vintage, 7 rounds stale) —
    # includes the two round-9 dedup rewrites' first driver re-proof
    "dedup_exact",
    "dedup_window_first",
    "text_stats",
    "lang_id_heuristic",
    "token_count_regex",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sample_hash_deterministic",
    "vocab_top_tokens",
    "ngram_bigram_counts",
    "doc_quality_filter",
    "dedup_levenshtein",
    "text_tfidf_topk",
    "pipeline_corpus_curation",
    "decontaminate_ngram_overlap",
    "text_regex_scrub",
    "sample_weighted_mixture",
    "doc_chunk_sliding",
    "doc_repetition_ratio",
    "dedup_normalized_text",
    "token_count_arrow",
    "dedup_incremental_vs_corpus",
    "corpus_deterministic_shuffle",
    "doc_pack_greedy",
    "doc_length_ntile",
    "pipeline_corpus_curation_v2",
    "dedup_paragraph_boilerplate",
    "fingerprint_table_maintain",
    "sample_stratified_exact_k",
    "global_index_assignment",
    "dedup_keep_best",
    # second-session additions (retrieval.py): never-sampled queries
    # take slots over stale-green re-proofs — the displaced trio
    # (quality_linear_scorer / quality_scorer_weight_table /
    # corpus_epoch_repetition) is the cohort's lowest divergence risk
    # (a scorer pair whose mechanism doc_quality_filter still
    # re-proves, and an integer-exact repetition plan) and rotates
    # next round
    "dedup_winnow_fingerprint",
    "text_bm25_topk",
    "decontaminate_winnow_spans",
    "dedup_paragraph_reassemble",
    "corpus_snapshot_diff",
    "boilerplate_prefix_strip",
    "sample_temperature_mixture",
    "quality_topp_per_language",
    "pipeline_mixture_assembly",
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
    from . import retrieval  # noqa: F401
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
