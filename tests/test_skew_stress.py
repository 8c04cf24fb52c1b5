"""Skew-stress: AQE skew-join splitting on Zipf-distributed REAL tables
(round-9 verdict, "Next round #1").

`tests/test_skew_aqe.py` proves the mechanism on a synthetic 95%-hot-key
frame; this suite proves it on the engine's own registry queries over
generator data with the realistic web-corpus key shape —
``dev/gen_scale_data.py --skew 1.2`` draws o_custkey / l_partkey /
l_suppkey / user_id Zipf(1.2) (hottest customer ~20% of all orders,
hottest part ~20% of all lineitem) and gives 0.1% of orders a 50-500
line bulk tail.

Byte thresholds are compressed the same way test_skew_aqe.py does —
autoBroadcastJoinThreshold off (at 100 TB customer/part exceed any
broadcast budget naturally; the small-regime broadcast would otherwise
immunize the join and hide the skew path) and
skewedPartitionThresholdInBytes scaled to test-sized shuffles (the
default 256 MB corresponds to multi-GB production partitions).  What is
asserted is therefore the MECHANISM on real plans + real skewed data:

- AQE marks and splits the oversized partition (``skew=true`` on the
  join) for the fact-fact joins the round-9 verdict named: customer ⋈
  orders on Zipf o_custkey (q10 shape) and part ⋈ lineitem on Zipf
  l_partkey (q14 shape, with the _dim_hint size gate flipped large so
  the hint is withheld — the same composition a true 100 TB run hits);
- splitting does not change results: each query collects identically
  with skewJoin disabled.

The skewed table set generates once per session into $TMPDIR (sf0.05,
~8 MB, a few seconds) unless /root/repo/scaledata/sf0.05-skew1.2
already exists.  Wall-time evidence at skewed sf1 lives in SCALE.md
(dev/skew_r10) — this suite pins behavior, not seconds.
"""

from __future__ import annotations

import os
import sys
import tempfile
from contextlib import contextmanager

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from datafusion_comet_spark.catalog import _TABLE_BYTES_CACHE
from datafusion_comet_spark.queries import load_all

SKEW_SF = 0.5
SKEW_S = 1.2


@pytest.fixture(scope="session")
def skew_dir():
    pre = os.path.join(REPO, "scaledata", f"sf{SKEW_SF:g}-skew{SKEW_S:g}")
    if os.path.isdir(pre) and os.path.exists(os.path.join(pre, "lineitem.parquet")):
        return pre
    out = os.path.join(
        tempfile.gettempdir(), f"dcs_skew_sf{SKEW_SF:g}-{SKEW_S:g}"
    )
    if os.path.exists(os.path.join(out, "embeddings.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    sys.path.insert(0, os.path.join(REPO, "dev"))
    import gen_scale_data as gsd

    gsd.SKEW = SKEW_S
    try:
        gsd.gen_region_nation(out)
        nc = gsd.gen_customer(out, SKEW_SF)
        ns = gsd.gen_supplier(out, SKEW_SF)
        npart = gsd.gen_part(out, SKEW_SF)
        gsd.gen_orders_lineitem(out, SKEW_SF, nc, npart, ns)
        gsd.gen_events(out, SKEW_SF)
        gsd.gen_documents(out, SKEW_SF)
        gsd.gen_embeddings(out, SKEW_SF)
    finally:
        gsd.SKEW = None
    return out


@contextmanager
def _conf(spark, settings: dict[str, str]):
    saved = {}
    for k, v in settings.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# the same byte regime test_skew_aqe.py uses (1 MB thresholds on a
# multi-MB hot partition).  Round-10 calibration note: sub-100k
# thresholds do NOT reliably detect hot partitions below ~1 MB —
# MapStatus stores per-partition sizes log-quantized and lz4 collapses
# a constant hot key, so a 32k-row hot partition of narrow pruned rows
# can report under even a 1k threshold.  Production-ratio thresholds
# on production-ratio bytes (sf0.5 fixture) are the honest probe.
_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
}


def _final_plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="extended")
    return buf.getvalue()


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


def test_custkey_zipf_join_is_split_and_correct(spark, skew_dir):
    """tpcds_net_after_returns: UNFILTERED orders ⋈ customer INNER on
    Zipf(1.2) o_custkey, with customer's _dim_hint forged LARGE so the
    size gate withholds the broadcast hint — the hottest customer
    holds ~20% of all orders, one shuffle partition dwarfs the median,
    and AQE must split it.  (An INNER join is used advisedly:
    OptimizeSkewedJoin can split the probe side of inner joins and the
    non-preserved side of outer joins ONLY — q13's LeftOuter with the
    skew on the right/probe side is structurally un-splittable, the
    negative case documented in SCALE.md "Skewed keys under joins".)

    This query also pins the SUPPRESSION corner found while building
    it: its groupBy(c_custkey, c_name) sits directly on the join and
    REUSES the join's hash partitioning (an exchange-free final
    aggregate — normally a shuffle-saving win), so OptimizeSkewedJoin
    declines to split (splitting breaks the partitioning and would add
    a shuffle).  `forceOptimizeSkewedJoin` is the documented trade —
    accept one extra exchange to kill the straggler — and at 100 TB a
    multi-GB hot partition is worth one exchange.  Asserted both ways:
    no split without force, split+identical results with it (SCALE.md
    "Skewed keys under joins")."""
    reg = load_all()
    fn = reg["tpcds_net_after_returns"].fn
    with _forged_bytes(skew_dir, "customer", 1 << 30):
        with _conf(spark, _SKEW_CONF):
            plan_noforce = _final_plan(fn(spark, skew_dir))
        assert "SortMergeJoin" in plan_noforce, plan_noforce[:2000]
        # partitioning-reuse suppression: no split without force
        assert "skew=true" not in plan_noforce, plan_noforce[:2500]
        with _conf(
            spark,
            {**_SKEW_CONF, "spark.sql.adaptive.forceOptimizeSkewedJoin": "true"},
        ):
            df = fn(spark, skew_dir)
            plan = _final_plan(df)
            split_rows = df.collect()
        assert "skew=true" in plan, (
            "AQE did not split the Zipf custkey join under force:\n" + plan[:2500]
        )
        with _conf(
            spark, {**_SKEW_CONF, "spark.sql.adaptive.skewJoin.enabled": "false"}
        ):
            unsplit_rows = fn(spark, skew_dir).collect()
    assert split_rows == unsplit_rows


def test_partkey_zipf_join_is_split_and_correct(spark, skew_dir):
    """tpcds_above_avg_discount (q92 shape): per-part discount stats
    joined back to the FULL fact on Zipf(1.2) l_partkey, with the
    _dim_hint size gate forged LARGE so the broadcast hint is withheld
    — the exact composition a 100 TB run reaches naturally (part past
    the broadcast budget -> shuffle join -> Zipf key -> skew split).
    This is also the round-10 agg+join-back rewrite's skew story
    working end-to-end: the window form this query replaced could NOT
    be rescued here (window partitions are un-splittable)."""
    reg = load_all()
    fn = reg["tpcds_above_avg_discount"].fn
    with _forged_bytes(skew_dir, "part", 1 << 30):
        with _conf(spark, _SKEW_CONF):
            df = fn(spark, skew_dir)
            plan = _final_plan(df)
            split_rows = df.collect()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        assert "skew=true" in plan, (
            "AQE did not split the Zipf partkey join:\n" + plan[:2500]
        )
        with _conf(
            spark, {**_SKEW_CONF, "spark.sql.adaptive.skewJoin.enabled": "false"}
        ):
            unsplit_rows = fn(spark, skew_dir).collect()
    assert split_rows == unsplit_rows


def test_skewed_aggregation_stays_correct(spark, skew_dir):
    """Hot-key groupBy (o_custkey Zipf): partial aggregation combines
    map-side, so a hot key never concentrates raw rows on one reducer.
    Pin the plan shape (two-phase HashAggregate) and spot-check the
    hottest key's aggregate against a direct filtered count."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(os.path.join(skew_dir, "orders.parquet"))
    agg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan[:1500]
    top = agg.orderBy(F.col("n").desc()).first()
    direct = orders.filter(F.col("o_custkey") == top.o_custkey).count()
    assert top.n == direct
    # Zipf(1.2) sanity: the hottest key really is hot (>= 10% of rows)
    assert top.n >= 0.10 * orders.count(), top


def test_duplication_skew_star_cluster(spark, tmp_path):
    """Duplication skew — the dedup-specific hot-key shape: ONE text
    duplicated k times puts k identical signatures in the same LSH
    bucket per band.  dedup_minhash_lsh's within-bucket self-join is
    O(k^2) there (k=3000 -> ~36M pre-filter join rows across 8 bands);
    dedup_lsh_star_cluster's hub form is O(k).  Pin three things on a
    k=3000 corpus: (1) the star query completes and puts all k copies
    in ONE cluster with the right canonical/size; (2) its edge count
    is linear (<= bands * (k-1) + noise), not quadratic; (3) cluster
    output matches the all-pairs form run on the (feasible) small
    driver corpus — equivalence is asserted separately in
    dev/gen_values_oracles.py's independent union-find."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.queries.datapipe import (
        lsh_band_buckets,
        minhash_signatures,
    )

    k = 3000
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        f"document {i} speaks of topic{i % 97} and value{i * 7 % 101} stuff"
        for i in range(500)
    ]
    texts = [dup_text] * k + uniq
    out = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(out),
    )
    reg = load_all()
    clusters = reg["dedup_lsh_star_cluster"].fn(spark, str(tmp_path)).collect()
    big = [r for r in clusters if r.cluster_size >= k]
    assert len(big) == 1, clusters[:5]
    assert big[0].canonical_doc == 0
    assert big[0].cluster_size == k, big[0]
    assert big[0].max_doc == k - 1

    # linearity: star edges stay O(bands * corpus); the all-pairs form
    # would exceed this by ~k/2 per band on the duplicated bucket
    docs = spark.read.parquet(str(out))
    bands = lsh_band_buckets(minhash_signatures(docs))
    n_bands = bands.select("band").distinct().count()
    hubs = bands.groupBy("band", "bucket").agg(F.min("doc_id").alias("hub"))
    n_star = (
        bands.join(hubs, ["band", "bucket"])
        .filter(F.col("doc_id") != F.col("hub"))
        .count()
    )
    assert n_star <= n_bands * (len(texts) - 1), (n_star, n_bands)


def test_duplication_skew_winnow(spark, tmp_path):
    """Duplication skew against the winnowing query: one text
    duplicated k times makes every one of its fingerprints k-hot.
    dedup_winnow_fingerprint counts sharing with a window over the
    fingerprint partition — k rows per hot fingerprint, never a pair
    join — so the plan must be JOIN-FREE (the structural linearity
    proof; a pair spelling would put k² rows in the hot bucket) and
    all k copies must come back flagged with every fingerprint
    shared."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_comet_spark.plans.introspect import plan_string
    from datafusion_comet_spark.queries import load_all

    k = 3000
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        f"document {i} speaks of topic{i % 97} and value{i * 7 % 101} stuff"
        for i in range(500)
    ]
    texts = [dup_text] * k + uniq
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    reg = load_all()
    res = reg["dedup_winnow_fingerprint"].fn(spark, str(tmp_path))
    plan = plan_string(res, "simple")
    for op in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "CartesianProduct",
        "BroadcastNestedLoopJoin",
    ):
        assert op not in plan, f"winnow plan grew a {op}:\n{plan[:1500]}"
    rows = {r["doc_id"]: r for r in res.collect()}
    missing = [d for d in range(k) if d not in rows]
    assert not missing, f"{len(missing)} duplicated docs unflagged"
    for d in range(k):
        assert rows[d]["n_shared"] == rows[d]["n_fps"], rows[d]
