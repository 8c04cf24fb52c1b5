"""Semantic pins for the retrieval operators (queries/retrieval.py).

The winnowing guarantee (Schleimer, Wilkerson, Aiken §2) is a theorem
about the SELECTION rule, independent of the corpus: if two documents
share any run of at least t = K + WIN - 1 tokens, their fingerprint
sets intersect.  The oracle differential (test_queries_oracle) proves
the Spark and DuckDB spellings agree; THIS file proves the spelling
implements winnowing at all — randomized documents with a planted
shared span must always collide, documents with no shared K-gram must
never collide.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_comet_spark.queries.retrieval import K, WIN, winnow_fingerprints

T = K + WIN - 1  # the guarantee threshold


def _fps(spark, texts: list[str]) -> dict[int, set[str]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out: dict[int, set[str]] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(df).collect():
        out[r["doc_id"]].add(r["fp"])
    return out


def _words(rng: random.Random, n: int, vocab: int = 50) -> list[str]:
    return [f"w{rng.randrange(vocab)}" for _ in range(n)]


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10**6))
def test_planted_shared_span_always_collides(spark, seed):
    """Two random documents with a planted shared run of exactly T
    tokens (the guarantee threshold) share at least one fingerprint,
    wherever the span lands in each document."""
    rng = random.Random(seed)
    span = _words(rng, T)
    texts = []
    for _ in range(2):
        left = _words(rng, rng.randrange(0, 30))
        right = _words(rng, rng.randrange(0, 30))
        texts.append(" ".join(left + span + right))
    fps = _fps(spark, texts)
    assert fps[0] & fps[1], (
        f"no shared fingerprint despite a planted {T}-token span "
        f"(seed {seed}): {texts}"
    )


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10**6))
def test_disjoint_vocabularies_never_collide(spark, seed):
    """Documents built from disjoint vocabularies share no K-gram, so
    they must share no fingerprint (md5-prefix collisions aside, which
    at 64 bits over tens of grams are not observable)."""
    rng = random.Random(seed)
    a = " ".join(f"a{rng.randrange(40)}" for _ in range(rng.randrange(T, 60)))
    b = " ".join(f"b{rng.randrange(40)}" for _ in range(rng.randrange(T, 60)))
    fps = _fps(spark, [a, b])
    assert not (fps[0] & fps[1])
    # and each document DID produce fingerprints (the selection rule
    # never returns an empty set for a doc at/above the threshold)
    assert fps[0] and fps[1]


def test_fingerprint_count_is_thinned(spark):
    """Winnowing selects at most one fingerprint per window START, and
    in expectation ~2/(WIN+1) of gram positions — the whole point of
    the scheme is that the index is a fraction of the gram stream.
    Pin the hard upper bound and the thinning on a long random doc."""
    rng = random.Random(7)
    n = 400
    text = " ".join(_words(rng, n, vocab=10**6))  # all grams distinct
    fps = _fps(spark, [text])[0]
    n_grams = n - K + 1
    n_windows = n_grams - WIN + 1
    assert len(fps) <= n_windows
    # expectation 2/(w+1) = 0.4 of gram positions; allow generous slack
    assert len(fps) <= 0.6 * n_grams
    assert len(fps) >= 0.2 * n_grams
