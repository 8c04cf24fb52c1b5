"""The plan-regime ladder's ENDPOINT: asymptotic (100 TB) plan pins.

The exact plan suites pin two regime windows (small: lineitem <= 32 MB;
large: 32-200 MB) and SKIP beyond them because each scale rung flips
more broadcasts to shuffles (SCALE.md, "The broadcast-flip LADDER").
The ladder's endpoint, though, is scale-STABLE: once every scaling
table is past any broadcast budget, every scaling join is a shuffle
join and the plan stops changing.  Round 9 argued that; this suite
pins it.

``testing.asymptotic_mode`` forces the endpoint at test scale —
autoBroadcastJoinThreshold = -1 (no size-estimate broadcasts) plus
forged 1 TB byte counts so the size-gated hint helpers (_dim_hint /
_stats_join_back, tests/test_dim_hint.py) withhold their hints.  Two
contracts are then asserted for the headline set (TPC-H + the bench
family + the scale-critical pipeline/ANN queries):

1. **Asymptotic goldens** (`*.asymptotic.txt`): the exact operator
   sequence Catalyst commits to at the endpoint.  Unlike the two
   window golden sets these hold at EVERY data scale (nothing in the
   plan depends on size estimates any more), so there is no skip
   guard — the ladder is closed at both ends.
2. **No scaling build side**: nothing under any BroadcastExchange
   scans a scaling table.  What may remain broadcast is exactly the
   scale-invariant set: region/nation (fixed cardinality by TPC-H
   construction) and explicit hints on provably bounded derivations
   (scalar thresholds, literal spines, |langs|-row cutoffs).

Reference analog: the reference's plan-stability suite pins one
approved plan per TPC-DS query at one scale
(CometPlanStabilitySuite.scala:78-125); the regime ladder here pins
three windows of the same contract, with this file as the invariant
end of it.

Regenerate after an intentional plan change:

    SPARK_GRAFT_REGEN_GOLDENS=1 python -m pytest tests/test_asymptotic_regime.py
"""

from __future__ import annotations

import os
import re

import pytest

from datafusion_comet_spark.catalog import FIXED_SIZE_DIMS
from datafusion_comet_spark.plans.introspect import (
    operators_in_plan,
    scans_under_broadcast,
)
from datafusion_comet_spark.queries import load_all
from datafusion_comet_spark.testing import asymptotic_mode

REGISTRY = load_all()
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "plans")
REGEN = os.environ.get("SPARK_GRAFT_REGEN_GOLDENS") == "1"

# The headline set: every TPC-H shape, the bench family, and the
# scale-critical pipeline/ANN/dedup/retrieval queries whose asymptotic
# behavior IS their 100 TB claim.  Membership is a POLICY, not a
# curated whim (round-11 advice item 5): every query tagged with one
# of POLICY_TAGS must either appear here (and carry a committed
# .asymptotic.txt golden) or carry a written justification in
# ASYMPTOTIC_OPT_OUT — enforced by test_asymptotic_policy below, so a
# future bench/dedup/ann/retrieval registration cannot silently skip
# the 100 TB contract.  Queries without those tags stay out: a
# map-only expression query has no join strategy to flip, and pinning
# ~300 asymptotic goldens would double suite time for no additional
# invariant.
POLICY_TAGS = {"bench", "dedup", "ann", "retrieval"}

# Opt-outs need a reason a reviewer can check, not a tag:
ASYMPTOTIC_OPT_OUT: dict[str, str] = {
    "dedup_cluster_components": (
        "connected_components converges data-dependently (early-exit "
        "fixpoint loop over localCheckpoint'd labels): the captured "
        "plan is a checkpoint scan whose depth varies with cluster "
        "diameter, so a fixed golden would pin an iteration count the "
        "data decides; scale posture is the O(diameter) keyed-shuffle "
        "argument pinned in its docstring and test_datapipe tests"
    ),
    "fingerprint_table_maintain": (
        "executes a parquet write + read-back inside the query fn; "
        "the returned plan is a scan of the just-written scratch table "
        "(per-run paths), not a join-strategy surface; the write "
        "layout and anti-join pruning are pinned by its oracle row and "
        "the sources tests"
    ),
    "stream_dedup": (
        "streaming availableNow execution inside the query fn: the "
        "batch plan is per-microbatch and asymptotic_mode's static "
        "capture does not apply; O(state) scale posture is covered in "
        "queries/streaming_fast.py and SCALE.md's streaming section"
    ),
    "stream_dedup_within_watermark": (
        "same as stream_dedup: per-microbatch streaming plans are "
        "outside asymptotic_mode's static capture"
    ),
    "stream_fast_dedup": (
        "same as stream_dedup: per-microbatch streaming plans are "
        "outside asymptotic_mode's static capture"
    ),
}

ASYMPTOTIC_PINNED = sorted(
    {n for n in REGISTRY if re.match(r"q\d+_", n)}
    | {
        n
        for n, q in REGISTRY.items()
        if POLICY_TAGS & set(q.tags) and n not in ASYMPTOTIC_OPT_OUT
    }
    | {
        "ann_ivf_multiprobe",
        "ann_ivf_pq_adc",
        "ann_lsh_bucketed",
        "ann_quantized_rerank",
        "dedup_embedding_cosine",
        "dedup_embedding_star_cluster",
        "dedup_levenshtein",
        "dedup_lsh_star_cluster",
        "dedup_winnow_fingerprint",
        "decontaminate_ngram_overlap",
        "decontaminate_winnow_spans",
        "events_sessionize",
        "pipeline_corpus_curation",
        "pipeline_corpus_curation_v2",
        "text_bm25_topk",
        "tpcds_week_offset_join",
    }
)


def test_asymptotic_policy():
    """Every POLICY_TAGS-tagged query is pinned or justified — the
    100 TB contract is opt-out-with-justification, not opt-in."""
    tagged = {n for n, q in REGISTRY.items() if POLICY_TAGS & set(q.tags)}
    missing = tagged - set(ASYMPTOTIC_PINNED) - set(ASYMPTOTIC_OPT_OUT)
    assert not missing, (
        f"queries tagged {sorted(POLICY_TAGS)} with neither an "
        f"asymptotic golden nor an opt-out justification: "
        f"{sorted(missing)}"
    )
    # keep the opt-out list honest: every entry must still exist, be
    # policy-tagged, not ALSO be pinned, and carry a non-trivial reason
    for name, reason in ASYMPTOTIC_OPT_OUT.items():
        assert name in REGISTRY, f"opt-out for unknown query {name!r}"
        assert POLICY_TAGS & set(REGISTRY[name].tags), (
            f"opt-out {name!r} is not policy-tagged — delete the entry"
        )
        assert name not in ASYMPTOTIC_PINNED, (
            f"{name!r} is both pinned and opted out — pick one"
        )
        assert len(reason) >= 40, f"opt-out {name!r} needs a real reason"
    # and every pinned name has its golden committed
    missing_goldens = [
        n for n in ASYMPTOTIC_PINNED if not os.path.exists(_golden_path(n))
    ]
    assert not missing_goldens, (
        f"pinned without committed goldens: {missing_goldens}; "
        "run SPARK_GRAFT_REGEN_GOLDENS=1 and commit"
    )


def _golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.asymptotic.txt")


@pytest.mark.parametrize("name", ASYMPTOTIC_PINNED)
def test_asymptotic_plan_golden(spark, sf_dir, name):
    spark.catalog.clearCache()  # see test_tpcds_exchange_budgets
    with asymptotic_mode(spark, sf_dir):
        df = REGISTRY[name].fn(spark, sf_dir)
        ops = operators_in_plan(df)
    path = _golden_path(name)
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(ops) + "\n")
        pytest.skip(f"golden regenerated: {path}")
    if not os.path.exists(path):
        pytest.fail(
            f"no committed asymptotic golden for {name!r} at {path}; "
            "generate one with SPARK_GRAFT_REGEN_GOLDENS=1 and commit it"
        )
    with open(path) as f:
        golden = f.read().splitlines()
    assert ops == golden, (
        f"asymptotic (100 TB regime) plan shape changed for {name!r}:\n"
        f"  golden : {golden}\n"
        f"  current: {ops}\n"
        "If intentional, regenerate with SPARK_GRAFT_REGEN_GOLDENS=1."
    )


# The broadcast CONTRACT at the asymptote: which scaling-table scans
# are allowed to sit under a BroadcastExchange once every size gate is
# forced off, and why each is scale-safe.  Every entry was adjudicated
# by reading the subtree between the scan and the exchange — the rows
# that actually materialize on executors are BOUNDED DERIVATIONS of
# the scaled scan, not its rows:
#
# - ann_* family + multimodal_embed_ann: the broadcast side is the
#   QUERY SET — a constant id predicate (`vec_id < 3` in similarity.py,
#   `doc_id < 3` in multimodal.py) whose row count is fixed by the
#   literal, not the corpus (pq_adc broadcasts it twice: probe +
#   rerank legs).
# - q11 / q15 / q22 / text_bm25_topk / tpcds_cross_channel_rollup /
#   tpcds_return_ratio_rank: 1-row SCALAR aggregates (thresholds,
#   N/avgdl stats) — the subtree ends in a keyless HashAggregate, so
#   the exchange carries one row regardless of fact size.  q15's
#   second broadcast is the revenue aggregate FILTERED to = max
#   (tie-bounded); return_ratio_rank's scalar-pair CartesianProduct
#   (1×1 rows) recurs across its persisted-candidate branches, hence
#   the repeat count.
#
# OPAQUE nodes (round-11 advice): scans_under_broadcast now also
# reports ReusedExchange / InMemoryTableScan descendants of a
# BroadcastExchange as `<opaque:OpName>` markers, because a cached or
# reused build side prints no FileScan of its own and could otherwise
# smuggle a scaling scan past this contract.  Each allowlisted marker
# was adjudicated by reading the subtree between the opaque node and
# its exchange:
#
# - tpcds_return_ratio_rank's 12 InMemoryTableScan markers are the
#   persisted per-partkey candidate aggregate (the single-fact-pass
#   cache, tpcds_style2.py persist() note) read under the threshold /
#   rank-count broadcasts — every one of those subtrees ends in a
#   keyless scalar aggregate or a limit(10)→agg, so the exchange
#   carries ≤ 1 row regardless of fact size.  The cached relation
#   itself is |parts|-bounded and never broadcast raw.
# - text_bm25_multiquery: the marker is the persisted tf working set
#   read by the df aggregate — the broadcast above it is |terms|-
#   bounded (one row per distinct query term); the first 'documents'
#   is that cache's printed LINEAGE (the tokenize+semi-join definition
#   inside the InMemoryRelation — executed once into the cache, not
#   broadcast), the second is the keyless 1-row N/avgdl stats scan,
#   same as text_bm25_topk's entry.
#
# Anything NOT listed here that shows a scaling scan OR an
# unadjudicated opaque node under a broadcast in asymptotic mode is
# the 100 TB OOM class (a pinned broadcast on a growing table) and
# must fail.
ALLOWED_BOUNDED_BROADCASTS: dict[str, list[str]] = {
    "ann_bruteforce_topk": ["embeddings"],
    "ann_ivf_kmeans": ["embeddings"],
    "ann_ivf_multiprobe": ["embeddings"],
    "ann_ivf_pq_adc": ["embeddings", "embeddings"],
    "ann_quantized_rerank": ["embeddings"],
    "q11_important_stock": ["lineitem", "supplier"],
    "q15_top_supplier": ["lineitem", "lineitem", "lineitem"],
    "q22_sales_opportunity": ["customer"],
    "multimodal_embed_ann": ["documents"],
    "text_bm25_multiquery": [
        "<opaque:InMemoryTableScan>",
        "documents",
        "documents",
    ],
    "text_bm25_topk": ["documents"],
    "tpcds_cross_channel_rollup": ["lineitem"],
    "tpcds_return_ratio_rank": ["lineitem"] * 12
    + ["<opaque:InMemoryTableScan>"] * 12,
}


@pytest.mark.parametrize("name", ASYMPTOTIC_PINNED)
def test_no_scaling_broadcast_at_asymptote(spark, sf_dir, name):
    """Nothing under a BroadcastExchange may scan a scaling table once
    broadcasts are forced off — the 'pinned broadcast on a growing
    table' OOM class — except the adjudicated bounded derivations in
    ALLOWED_BOUNDED_BROADCASTS, pinned exactly (test_dim_hint.py
    asserts the size gates per-helper; this asserts the composed
    plans at the ladder's endpoint)."""
    spark.catalog.clearCache()
    with asymptotic_mode(spark, sf_dir):
        df = REGISTRY[name].fn(spark, sf_dir)
        scanned = scans_under_broadcast(df)
    offenders = sorted(t for t in scanned if t not in FIXED_SIZE_DIMS)
    expected = sorted(ALLOWED_BOUNDED_BROADCASTS.get(name, []))
    assert offenders == expected, (
        f"{name!r} asymptotic broadcast contract drift:\n"
        f"  allowed (bounded derivations): {expected}\n"
        f"  actual scaling scans under broadcast: {offenders}\n"
        "A NEW entry means a scaling table's rows are being broadcast "
        "at 100 TB scale — gate it (_dim_hint) or bound it, and only "
        "then extend the allowlist with the adjudication comment."
    )


def test_asymptotic_mode_restores_state(spark, sf_dir):
    """The context manager must not leak the forced regime into later
    tests: threshold and forged byte counts restored on exit."""
    from datafusion_comet_spark.catalog import _TABLE_BYTES_CACHE, table_bytes

    before_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    real_bytes = table_bytes(sf_dir, "lineitem")
    with asymptotic_mode(spark, sf_dir):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        assert _TABLE_BYTES_CACHE[(sf_dir, "lineitem")] == 1 << 40
    assert (
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        == before_threshold
    )
    assert table_bytes(sf_dir, "lineitem") == real_bytes
