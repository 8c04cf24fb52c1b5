"""Retrieval / local-fingerprint operators over the documents corpus.

Two capabilities a training-data pipeline needs that the doc-level
dedup family (datapipe.py) does not cover:

- **Winnowing fingerprints** (Schleimer, Wilkerson, Aiken — the MOSS
  local fingerprinting scheme): k-gram rolling hashes thinned by a
  window-min rule, guaranteeing any shared run of >= k+w-1 tokens
  shares at least one fingerprint.  This catches COPIED SPANS between
  otherwise-different documents — the substring-duplication class that
  whole-document MinHash/SimHash signatures miss (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better" treat
  substring dedup as its own pass for exactly this reason).
- **BM25 ranked retrieval** (Robertson/Spärck Jones, k1=1.2 b=0.75):
  the standard lexical relevance score, used in data pipelines for
  query-based corpus audits and hard-negative mining.

The reference engine has no retrieval surface at all (its closest
analog is the expression kernels both of these compile onto); both
operators here are pure JVM expression/aggregate compositions — no
Python in the hot path, no pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register
from ._shared import _dim_hint

# Winnowing parameters: k tokens per gram, w grams per window.  Any
# shared token run of length >= K + WIN - 1 (the paper's guarantee
# threshold t = k + w - 1) shares a fingerprint.
K = 4
WIN = 4

# BM25 free parameters (the standard Okapi defaults) and the audit
# query's term set (drawn from the corpus vocabulary).
BM25_TERMS = ("spark", "merge", "window")


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *carry, fp) rows: the winnowing fingerprint set of each
    document's ``text`` column — K-token-gram md5-prefix hashes,
    window-min selected, deduplicated map-side by array_distinct.  The
    selection guarantee (Schleimer et al. §2): two documents sharing
    any token run of length >= K + WIN - 1 share at least one
    fingerprint (pinned by tests/test_retrieval_semantics.py).  Pure
    per-row array expressions until the final explode of the
    already-thinned set."""
    keep = [id_col, *carry]
    toked = docs.select(
        *keep, F.split(F.lower("text"), " ").alias("toks")
    ).filter(F.size("toks") >= K + WIN - 1)
    hashed = toked.select(
        *keep,
        F.expr(
            f"transform(sequence(1, size(toks) - {K} + 1), "
            f"i -> substring(md5(concat_ws(' ', slice(toks, i, {K}))), 1, 16))"
        ).alias("hashes"),
    )
    return hashed.select(
        *keep,
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, size(hashes) - {WIN} + 1), "
                f"s -> array_min(slice(hashes, s, {WIN}))))"
            )
        ).alias("fp"),
    )


@register(
    "dedup_winnow_fingerprint",
    oracle=f"""
WITH fps AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(hashes) - {WIN} + 2),
           s -> list_aggregate(hashes[s:s+{WIN - 1}], 'min')))) AS fp
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(toks) - {K} + 2),
             i -> substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16)) AS hashes
    FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents)
    WHERE len(toks) >= {K + WIN - 1}
  )
), marked AS (
  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS n_docs_fp
  FROM fps
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_fps,
       CAST(sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
FROM marked
GROUP BY doc_id
HAVING sum(CASE WHEN n_docs_fp >= 2 THEN 1 ELSE 0 END) * 2 >= count(*)
ORDER BY doc_id
""",
    tags=("retrieval", "datapipe", "dedup", "fingerprint", "bench"),
)
def dedup_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing local fingerprints → substring-duplication suspects.

    Per document: hash every K-token gram (engine-portable md5 hex
    prefix, lexicographic = numeric order), keep the minimum of every
    WIN-gram window (the winnowing rule — selected positions are a
    provable cover of any shared run >= K+WIN-1 tokens), and flag
    documents where shared fingerprints (appearing in >= 2 docs) are
    at least half of their fingerprint set.

    Shape at 100 TB: gram hashing and window-min both run INSIDE the
    per-row array expressions (transform/sequence/slice/array_min —
    whole-stage codegen, zero Python, zero explode until the
    fingerprint set is already thinned ~1/WIN and deduplicated
    map-side by array_distinct).  Sharing is counted with ONE window
    pass hash-partitioned on the fingerprint — never a pair join, so a
    boilerplate span duplicated across k documents costs k rows, not
    k² (the duplication-skew lesson from dedup_lsh_star_cluster).
    Exchanges: fp window + doc_id aggregate = 2.
    """
    fps = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    marked = fps.withColumn(
        "n_docs_fp", F.count(F.lit(1)).over(W.partitionBy("fp"))
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.sum(F.when(F.col("n_docs_fp") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .filter(F.col("n_shared") * 2 >= F.col("n_fps"))
        .orderBy("doc_id")
    )


@register(
    "text_bm25_topk",
    oracle=f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
  FROM (
    SELECT doc_id, len(str_split(lower(text), ' ')) AS dl,
           unnest(str_split(lower(text), ' ')) AS tok
    FROM documents
  )
  WHERE tok IN {BM25_TERMS!r}
  GROUP BY doc_id, tok
), stats AS (
  SELECT count(*) AS n_docs,
         sum(len(toks)) AS sum_dl,
         {", ".join(f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}" for t in BM25_TERMS)}
  FROM (SELECT str_split(lower(text), ' ') AS toks FROM documents)
), withdf AS (
  SELECT tf.doc_id, tf.tf, tf.dl, stats.n_docs, stats.sum_dl,
         CASE tf.tok {" ".join(f"WHEN '{t}' THEN stats.df_{t}" for t in BM25_TERMS)} END AS df
  FROM tf CROSS JOIN stats
), scored AS (
  SELECT doc_id,
         CAST(round(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * 2.2)
           / (tf + 1.2 * (0.25 + 0.75 * dl /
                (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
           * 1000000.0) AS BIGINT) AS contrib_micros
  FROM withdf
)
SELECT doc_id, bm25_micros, rn FROM (
  SELECT doc_id,
         CAST(sum(contrib_micros) AS BIGINT) AS bm25_micros,
         CAST(row_number() OVER (
           ORDER BY sum(contrib_micros) DESC, doc_id) AS INT) AS rn
  FROM scored GROUP BY doc_id
) t
WHERE rn <= 10
ORDER BY rn
""",
    tags=("retrieval", "text", "bm25", "bench"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed audit-query term set.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contribution
    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with k1=1.2, b=0.75.
    Each (doc, term) contribution is quantized to integer MICROS
    before the per-doc sum: double sums are addend-order-dependent
    (the round(sum(double)) flake class in COMPAT.md), integer sums
    are exact and order-free — ranking and the driver hash are stable
    by construction, with only the one deterministic per-contribution
    rounding left in double space.

    Shape at 100 TB: ONE corpus scan feeds tf and dl together (dl
    rides the tokenize projection; no join back to the corpus); the
    term filter drops non-query tokens before the (doc, tok)
    aggregate so the shuffle carries only matching docs; per-term
    document frequencies ride the SAME keyless 1-row aggregate as
    N/sum_dl (array_contains per literal term — the first two
    spellings of this query were both scale traps: a groupBy-join df
    re-scanned the corpus, and a window df partitioned by a
    |terms|-cardinality key, serializing every matched row through
    ≤|terms| tasks); the scored rows pick their df from the broadcast
    1-row stats by a CASE on the term; the final top-k is a
    single-partition window over the per-doc aggregate (rows already
    reduced to matched docs), never a global sort of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    toks = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("tok"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
        *[
            F.sum(F.array_contains("toks", t).cast("int"))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    df_case = F.when(F.col("tok") == BM25_TERMS[0], F.col(f"df_{BM25_TERMS[0]}"))
    for t in BM25_TERMS[1:]:
        df_case = df_case.when(F.col("tok") == t, F.col(f"df_{t}"))
    scored = (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("df", df_case)
        .withColumn(
            "avgdl",
            F.col("sum_dl").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "contrib_micros",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
                * 1000000.0
            ).cast("bigint"),
        )
    )
    w = W.orderBy(F.col("bm25_micros").desc(), "doc_id")
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib_micros").cast("bigint").alias("bm25_micros"))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 10)
        .orderBy("rn")
    )


@register(
    "decontaminate_winnow_spans",
    oracle=f"""
WITH fps AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           range(1, len(hashes) - {WIN} + 2),
           s -> list_aggregate(hashes[s:s+{WIN - 1}], 'min')))) AS fp
  FROM (
    SELECT doc_id, source,
           list_transform(range(1, len(toks) - {K} + 2),
             i -> substr(md5(array_to_string(toks[i:i+{K - 1}], ' ')), 1, 16)) AS hashes
    FROM (SELECT doc_id, source, str_split(lower(text), ' ') AS toks
          FROM documents)
    WHERE len(toks) >= {K + WIN - 1}
  )
), eval_fps AS (
  SELECT DISTINCT fp FROM fps WHERE doc_id % 25 = 0
), hit AS (
  SELECT t.doc_id, t.source, count(*) AS n_spans
  FROM fps t JOIN eval_fps e USING (fp)
  WHERE t.doc_id % 25 <> 0
  GROUP BY t.doc_id, t.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_flagged,
       CAST(max(n_spans) AS BIGINT) AS max_spans,
       CAST(sum(n_spans) AS BIGINT) AS total_spans
FROM hit
GROUP BY source
ORDER BY source
""",
    tags=("retrieval", "datapipe", "decontamination", "fingerprint"),
)
def decontaminate_winnow_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level benchmark decontamination: flag training
    documents sharing a winnow fingerprint with the eval set (every
    25th document here; a benchmark suite in production) — i.e. a
    likely COPIED SPAN of >= K+WIN-1 tokens, the leakage class the
    5-gram set-overlap pass (decontaminate_ngram_overlap) reports only
    statistically and a MinHash doc-signature misses entirely.

    Shape at 100 TB: the eval index is the winnowed fingerprint set —
    ~2/(WIN+1) of the eval corpus's grams by the winnowing density
    bound, so the thing broadcast is a FRACTION of what the 5-gram
    variant ships — and the training side joins against it with no
    shuffle of the corpus (the broadcast is size-gated the same way:
    eval suites are fixed-size in production, this fixture's grows
    with the corpus, so _dim_hint keys on the documents table).
    Per-doc hit counts aggregate (doc_id, source) pairs, never text.
    """
    fps = winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), carry=("source",)
    )
    eval_fps = fps.filter(F.col("doc_id") % 25 == 0).select("fp").distinct()
    hits = (
        fps.filter(F.col("doc_id") % 25 != 0)
        .join(_dim_hint(eval_fps, sf_dir, "documents"), "fp")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs_flagged"),
            F.max("n_spans").cast("bigint").alias("max_spans"),
            F.sum("n_spans").cast("bigint").alias("total_spans"),
        )
        .orderBy("source")
    )
