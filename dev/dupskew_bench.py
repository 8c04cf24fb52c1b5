#!/usr/bin/env python
"""Uniform-vs-duplication-skew wall-time series for the dedup family
(round-10 verdict, "Next round #2").

Runs the dedup/winnow/star/minhash family at two generator dirs that
differ ONLY in duplication structure (gen_scale_data.py --dup-skew:
fact/dim tables byte-identical, ~10% of documents/embeddings rows in
Zipf-sized duplicate clusters, hottest cluster = 1% of the corpus) and
prints one bench-style JSON line per dir.  Render the comparison with
dev/skew_report.py uniform.json dup.json.

The hypothesis under test (previously argued only by the k=3000
synthetic guard in tests/test_skew_stress.py): pair-join dedups
(minhash bucket join, ngram-jaccard blocking) do O(k²) work inside a
k-sized duplicate cluster, while the star-cluster forms (hub = min_by
per bucket -> k-1 edges) and the window/aggregate forms stay linear.

Usage:
    python dev/dupskew_bench.py /root/repo/scaledata/sf1      > uniform.json
    python dev/dupskew_bench.py /root/repo/scaledata/sf1-dup1.5 > dup.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# grouped by expected dup-skew response (see module docstring)
FAMILY = [
    # hash/window/aggregate forms — one fingerprint-keyed exchange,
    # hot clusters are absorbed by map-side partials: expect flat
    "dedup_exact",
    "dedup_normalized_text",
    "dedup_window_first",
    "dedup_keep_best",
    # signature pair-joins — candidate pairs are quadratic in cluster
    # size: expect super-linear degradation.  dedup_minhash_ml is
    # EXCLUDED from the timed series: its unigram token-set signatures
    # (Tokenizer -> binary HashingTF) degenerate on this corpus's
    # 31-word vocabulary — every document's feature set is nearly the
    # whole vocab, so MinHashLSH buckets collapse and the
    # approxSimilarityJoin explodes at sf1 even on the UNIFORM corpus
    # (>12 min on one task, round-11 measurement; the shingle-based
    # dedup_minhash_lsh, whose K-word shingles stay discriminative,
    # runs in ~3 s on the same data).  Recorded in SCALE.md as the
    # vocabulary-density hazard of unigram-set LSH.
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    # star-cluster forms — hub edges, k-1 per cluster: expect flat
    "dedup_lsh_star_cluster",
    "dedup_embedding_star_cluster",
    # sorted-neighborhood / blocked forms
    "dedup_levenshtein",
    "dedup_embedding_cosine",
    "dedup_incremental_vs_corpus",
    # substring fingerprints (winnow family)
    "dedup_winnow_fingerprint",
    "dedup_winnow_cut",
    "decontaminate_winnow_spans",
    # sub-document forms
    "dedup_paragraph_boilerplate",
    "dedup_paragraph_reassemble",
    # pair-join -> connected components composition
    "dedup_cluster_components",
]


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    sf_dir = sys.argv[1].rstrip("/")

    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="dcs-dupskew-bench")
    registry["dedup_exact"].fn(spark, sf_dir).collect()  # warmup

    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERATIONS", "3"))
    per_query: dict[str, float] = {}
    for name in FAMILY:
        best = None
        n = 0
        for _ in range(iterations):
            spark.catalog.clearCache()  # persist()-using queries: cold each run
            t0 = time.perf_counter()
            n = len(registry[name].fn(spark, sf_dir).collect())
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
        per_query[name] = round(best, 3)
        print(f"# {name}: {per_query[name]:.3f}s ({n} rows)", file=sys.stderr)

    print(json.dumps({
        "metric": "dupskew_bench_total",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
